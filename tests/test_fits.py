"""FITS I/O round-trip tests."""

import numpy as np
import pytest

from pyimcom_tpu.fitsio import HDUList, Header, ImageHDU, TableHDU, fits_read, fits_write


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32,
                                   np.float64, np.uint16])
def test_image_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, size=(7, 11)).astype(dtype)
    else:
        data = rng.normal(size=(7, 11)).astype(dtype)
    fits_write(tmp_path / "t.fits", HDUList([ImageHDU(data)]))
    back = fits_read(tmp_path / "t.fits")
    np.testing.assert_array_equal(back[0].data, data)


def test_multi_hdu_with_names(tmp_path):
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    b = np.arange(8, dtype=np.int32).reshape(2, 4)
    hdus = HDUList([ImageHDU(a), ImageHDU(b, name="SCI"), ImageHDU(a * 2, name="ERR")])
    fits_write(tmp_path / "m.fits", hdus)
    back = fits_read(tmp_path / "m.fits")
    np.testing.assert_array_equal(back["SCI"].data, b)
    np.testing.assert_array_equal(back["ERR"].data, a * 2)


def test_header_keywords(tmp_path):
    h = Header()
    h.set("SKY_MEAN", 12.375, "sky background")
    h.set("GOODVAL", 0)
    h.set("FILTER", "F184")
    h.set("FLAG", True)
    fits_write(tmp_path / "h.fits", HDUList([ImageHDU(np.zeros((2, 2)), header=h)]))
    back = fits_read(tmp_path / "h.fits")[0].header
    assert back["SKY_MEAN"] == 12.375
    assert back["GOODVAL"] == 0
    assert back["FILTER"] == "F184"
    assert back["FLAG"] is True


def test_bintable_roundtrip(tmp_path):
    t = TableHDU(data={
        "obsid": np.arange(5, dtype=np.int32),
        "sca": np.arange(5, dtype=np.int16) + 1,
        "ra": np.linspace(0, 359, 5),
        "expt": np.linspace(0, 1, 5).astype(np.float32),
        "valid": np.array([True, False, True, True, False]),
        "filter": np.array(["F184", "H158", "Y106", "K213", "W146"]),
    }, name="OBS")
    fits_write(tmp_path / "t.fits", HDUList([ImageHDU(None), t]))
    back = fits_read(tmp_path / "t.fits")["OBS"]
    np.testing.assert_array_equal(back["obsid"], np.arange(5))
    np.testing.assert_array_equal(back["valid"], [True, False, True, True, False])
    np.testing.assert_allclose(back["ra"], np.linspace(0, 359, 5))
    assert list(back["filter"]) == ["F184", "H158", "Y106", "K213", "W146"]


def test_asciitable_roundtrip(tmp_path):
    lines = np.array(['{', ' "KEY": [1, 2]', '}'])
    t = TableHDU(data={"text": lines}, name="CONFIG", ascii_table=True)
    t.columns = [("text", "A512")]
    fits_write(tmp_path / "a.fits", HDUList([ImageHDU(None), t]))
    back = fits_read(tmp_path / "a.fits")["CONFIG"]
    assert list(back["text"]) == list(lines)


def test_garbage_rejected(tmp_path):
    with open(tmp_path / "g.fits", "wb") as f:
        f.write(b"not a fits file")
    with pytest.raises(ValueError):
        fits_read(tmp_path / "g.fits")


def test_3d_and_4d_images(tmp_path):
    cube = np.random.default_rng(1).normal(size=(2, 3, 4, 5)).astype(np.float32)
    fits_write(tmp_path / "c.fits", HDUList([ImageHDU(cube)]))
    back = fits_read(tmp_path / "c.fits")
    np.testing.assert_array_equal(back[0].data, cube)
