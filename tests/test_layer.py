"""Layer subsystem unit tests: seeds, noise reproducibility, name broker."""

import numpy as np
import pytest

from pyimcom_tpu.layer import (
    galaxy_ft,
    get_sca_imagefile,
    layer_seed,
    noise_1f_frame,
    parse_gsext_args,
    _shear_matrix,
)


def test_layer_seed_convention():
    """seed = 1000000*(18q + sca) + obsid (reference layer.py:1301)."""
    assert layer_seed(1, (123, 5)) == 1000000 * (18 + 5) + 123
    assert layer_seed(0, (7, 18)) == 18000000 + 7


def test_noise_1f_statistics():
    frame = noise_1f_frame(layer_seed(2, (3, 1)))
    assert frame.shape == (4088, 4088)
    # 1/f noise: power concentrated at low frequency along columns
    col_ps = np.abs(np.fft.rfft(frame[:, :128].mean(axis=1))) ** 2
    lo = col_ps[1:20].mean()
    hi = col_ps[-200:].mean()
    assert lo > 10 * hi
    # reproducible
    frame2 = noise_1f_frame(layer_seed(2, (3, 1)))
    np.testing.assert_array_equal(frame, frame2)


def test_name_broker_formats():
    obs = {"filter": np.array([1, 2])}
    assert get_sca_imagefile("/d", (0, 7), obs, "L2_fits") == "/d/sim_L2_F184_0_7.fits"
    assert get_sca_imagefile("/d", (1, 7), obs, "L2_2506") == "/d/sim_L2_H158_1_7.asdf"
    assert get_sca_imagefile("/d", (0, 3), obs, "dc2_imsim") == "/d/simple/dc2_F184_0_3.fits"
    assert get_sca_imagefile("/d", (0, 3), obs, "anlsim") \
        == "/d/simple/Roman_WAS_simple_model_F184_0_3.fits"
    assert get_sca_imagefile("/d", (0, 3), obs, "L2_fits",
                             extraargs={"type": "mask"}).endswith("_mask.fits")
    assert get_sca_imagefile("/d", (0, 3), obs, "nonsense") is None


def test_parse_gsext_args():
    a = parse_gsext_args(["n=0.5", "hlr=0.1", "shape=0.2:0.1", "shear=0.05:-0.12"])
    assert a["n"] == 0.5 and a["hlr"] == 0.1
    assert a["shape"] == (0.2, 0.1)
    assert a["shear"] == (0.05, -0.12)
    b = parse_gsext_args(["seed=100", "rot=45"])
    assert b["seed"] == 100 and b["rot"] == 45.0


def test_galaxy_ft_unit_flux_and_profiles():
    n = 64
    uy = np.fft.fftfreq(n)[:, None]
    ux = np.fft.rfftfreq(n)[None, :]
    A = np.eye(2)
    for prof in (0.5, 1.0):
        g = galaxy_ft(ux, uy, prof, 5.0, np.eye(2), A)
        assert abs(g[0, 0] - 1.0) < 1e-12  # unit flux
        img = np.fft.fftshift(np.fft.irfft2(g, s=(n, n)))
        # half-light radius check: flux inside r=hlr ~ half of total
        yy, xx = np.mgrid[0:n, 0:n] - n // 2
        r = np.hypot(yy, xx)
        frac = img[r <= 5.0].sum() / img.sum()
        assert abs(frac - 0.5) < 0.05, (prof, frac)
    with pytest.raises(NotImplementedError):
        galaxy_ft(ux, uy, 4.0, 5.0, np.eye(2), A)


def test_shear_matrix_unit_det():
    M = _shear_matrix(0.3, -0.2)
    assert abs(np.linalg.det(M) - 1.0) < 1e-12
    with pytest.raises(ValueError):
        _shear_matrix(0.8, 0.7)  # |e| >= 1
