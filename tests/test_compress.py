"""Compression tests: I24 codec round trips and block-file compress/decompress.

Mirrors the reference tests/pyimcom/test_cprs.py strategy.
"""

import numpy as np
import pytest

from pyimcom_tpu.compress.i24 import (
    diff_fwd,
    diff_rev,
    i24compress,
    i24decompress,
    lsbf_fwd,
    lsbf_rev,
    smallnum_fwd,
    smallnum_rev,
)


def test_lsbf_involution():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    np.testing.assert_array_equal(lsbf_rev(lsbf_fwd(im)), im)
    cube = rng.integers(0, 256, size=(3, 24, 40)).astype(np.uint8)
    np.testing.assert_array_equal(lsbf_rev(lsbf_fwd(cube)), cube)


def test_diff_roundtrip():
    rng = np.random.default_rng(1)
    for bitkeep in [8, 16, 23]:
        im = rng.integers(0, 2 ** bitkeep, size=(16, 17)).astype(np.int32)
        np.testing.assert_array_equal(diff_rev(diff_fwd(im, bitkeep), bitkeep), im)


def test_smallnum_roundtrip():
    bitkeep = 16
    im = np.arange(2 ** bitkeep, dtype=np.int32).reshape(256, 256)
    np.testing.assert_array_equal(smallnum_rev(smallnum_fwd(im, bitkeep), bitkeep), im)
    # small magnitudes (mod 2^bk) map to small unsigned values
    assert smallnum_fwd(np.array([0]), bitkeep)[0] == 0
    assert smallnum_fwd(np.array([2 ** bitkeep - 1]), bitkeep)[0] == 1
    assert smallnum_fwd(np.array([1]), bitkeep)[0] == 2


@pytest.mark.parametrize("scheme", ["I24A", "I24B"])
@pytest.mark.parametrize("pars", [
    {"VMIN": -1.0, "VMAX": 1.0},
    {"VMIN": -0.5, "VMAX": 2.0, "DIFF": True, "SOFTBIAS": 100},
    {"VMIN": -0.5, "VMAX": 2.0, "DIFF": True, "SOFTBIAS": -1, "BITKEEP": 20},
    {"VMIN": 0.0, "VMAX": 4.0, "ALPHA": 0.5, "REORDER": False},
])
def test_i24_roundtrip_with_overflow(scheme, pars):
    rng = np.random.default_rng(2)
    im = rng.normal(0, 0.4, size=(33, 47)).astype(np.float32)
    im[3, 5] = 17.0   # overflow high
    im[8, 2] = -9.0   # overflow low
    data, overflow = i24compress(im, scheme, pars)
    back = i24decompress(data, scheme, pars, overflow=overflow)
    bitkeep = int(pars.get("BITKEEP", 24))
    qstep = (pars["VMAX"] - pars["VMIN"]) / 2 ** bitkeep
    alpha = pars.get("ALPHA", 1.0)
    if alpha == 1.0:
        # qstep/2 mathematically, plus float32 arithmetic noise
        assert np.max(np.abs(back - im)) <= qstep + 4e-7 * np.max(np.abs(im))
    else:
        assert np.max(np.abs(back - im)) <= 10 * qstep  # power-law widens steps
    # overflow values restored exactly
    assert back[3, 5] == np.float32(17.0)
    assert back[8, 2] == np.float32(-9.0)


def test_unrecognized_scheme_passthrough():
    im = np.ones((4, 4), dtype=np.float32)
    data, ovf = i24compress(im, "NULL", {"VMIN": 0, "VMAX": 1})
    assert ovf is None
    np.testing.assert_array_equal(data, im)
    np.testing.assert_array_equal(i24decompress(data, "NULL", {}), im)


def test_string_pars_accepted():
    """Parameters read back from FITS headers arrive as strings."""
    im = np.random.default_rng(3).normal(size=(20, 20)).astype(np.float32)
    pars = {"VMIN": "-5.0", "VMAX": "5.0", "DIFF": "True", "SOFTBIAS": "-1",
            "BITKEEP": "20", "REORDER": "True"}
    data, ovf = i24compress(im, "I24B", pars)
    back = i24decompress(data, "I24B", pars, overflow=ovf)
    assert np.max(np.abs(back - im)) <= 10.0 / 2 ** 20


def test_compressed_output_roundtrip(tmp_path):
    """Full block-file compress -> write -> ReadFile restores layers."""
    from pyimcom_tpu.compress import CompressedOutput, ReadFile
    from pyimcom_tpu.fitsio import HDUList, Header, ImageHDU, TableHDU, fits_write

    rng = np.random.default_rng(4)
    cube = rng.normal(0, 0.3, size=(1, 3, 32, 32)).astype(np.float32)
    cfg_rows = np.array(['{', '"OBSFILE": "x", "INDATA": ["x", "L2_fits"],',
                         '"CTR": [0, 0], "OUTSIZE": [4, 8, 0.04], "BLOCK": 1,',
                         '"FILTER": 1, "INPSF": ["x", "L2_fits", 6], "OUT": "x"', '}'])
    cfg_hdu = TableHDU(data={"text": cfg_rows}, name="CONFIG", ascii_table=True)
    cfg_hdu.columns = [("text", "A512")]
    fname = str(tmp_path / "block.fits")
    fits_write(fname, HDUList([ImageHDU(cube), cfg_hdu]))

    co = CompressedOutput(fname)
    co.compress_layer(1, "I24B", {"VMIN": "-2.0", "VMAX": "2.0", "DIFF": "True",
                                  "SOFTBIAS": "-1"})
    co.compress_layer(2, "I24A", {"VMIN": "-2.0", "VMAX": "2.0"})
    cname = str(tmp_path / "block_cprs.fits")
    co.to_file(cname)

    f = ReadFile(cname)
    assert np.max(np.abs(f[0].data[0, 1] - cube[0, 1])) < 4.0 / 2 ** 24 + 1e-7
    assert np.max(np.abs(f[0].data[0, 2] - cube[0, 2])) < 4.0 / 2 ** 24 + 1e-7
    np.testing.assert_array_equal(f[0].data[0, 0], cube[0, 0])
    # compressed HDUs are gone after decompression
    assert not any(h.name.startswith("HSHX") for h in f)


def test_parser_templates():
    from pyimcom_tpu.compress.compressutils import _parser

    assert _parser("a/Q_02_31.fits") == "a/Q_02_31.fits"
    assert _parser("a/Row{1:d}/Q_{0:02d}_{1:02d}^_02_31.fits") == "a/Row31/Q_02_31.fits"
    assert _parser("a/Row{1:d}/Q_{0:02d}_{1:02d}^_02_12.fits.gz") == "a/Row12/Q_02_12.fits.gz"


def test_fname_errors():
    """File-name error contracts (reference test_fname.py)."""
    import pytest

    from pyimcom_tpu.compress.compressutils import CompressedOutput, ReadFile

    with pytest.raises(Exception, match="unrecognized file type"):
        CompressedOutput("unknown_file")
    with pytest.raises(ValueError, match="Scheme notascheme not supported"):
        ReadFile("notascheme://testonly/test.test")
