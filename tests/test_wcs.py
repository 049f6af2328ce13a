"""WCS tests: round-trips, projection identities, and pins against astropy-derived values."""

import numpy as np
import pytest

from pyimcom_tpu.config import Config
from pyimcom_tpu.wcsutil import (
    WCS,
    get_pix_area,
    local_partial_pixel_derivatives2,
    make_block_wcs,
    stg_projection_jax,
)

# Linear ARC approximation of Roman SCA 18 (CD matrix / CRPIX from the
# reference synthetic survey, tests/pyimcom/test_pyimcom.py:332-341) with
# pointing ra=60.08, dec=-3.2, pa=20 -> lonpole=200.  The two corner sky
# positions below were computed with astropy and asserted in the reference
# fixture (tests/pyimcom/conftest.py:193-199); they pin our projection math
# to astropy's.
SCA18 = dict(
    ctype=("RA---ARC", "DEC--ARC"),
    crval=(60.08, -3.2),
    crpix=(13350.5118589853 - 1.0, 7261.98346207507 - 1.0),  # FITS->0-indexed
    cd=np.array([[3.00880626223092e-05, -6.11545988258318e-07],
                 [4.89236790606654e-07, -2.92318982387476e-05]]),
    lonpole=200.0,
)


def test_arc_pins_against_astropy():
    w = WCS(**SCA18)
    ra, dec = w.pixel_to_world_values(4087.0, 0.0)
    assert np.hypot(ra - 59.89309302318237, dec + 2.9109906089005753) < 1e-6
    ra, dec = w.pixel_to_world_values(0.0, 4087.0)
    assert np.hypot(ra - 59.733417024909365, dec + 2.982181679089024) < 1e-6


@pytest.mark.parametrize("code", ["TAN", "STG", "ARC"])
def test_roundtrip(code):
    w = WCS(ctype=(f"RA---{code}", f"DEC--{code}"), crval=(60.05, -3.8),
            crpix=(2043.5, 2043.5),
            cd=np.array([[3.0e-5, 1.0e-6], [-1.2e-6, -2.9e-5]]), lonpole=240.0)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 4088, 300)
    y = rng.uniform(0, 4088, 300)
    ra, dec = w.pix2world(x, y)
    x2, y2 = w.world2pix(ra, dec)
    assert np.max(np.hypot(x2 - x, y2 - y)) < 1e-8


def test_all_pix2world_array_form():
    w = WCS(**SCA18)
    xy = np.array([[100.0, 200.0], [3000.0, 1500.0]])
    radec = w.all_pix2world(xy, 0)
    assert radec.shape == (2, 2)
    back = w.all_world2pix(radec, 0)
    np.testing.assert_allclose(back, xy, atol=1e-8)


def test_header_roundtrip():
    w = WCS(**SCA18)
    hdr = w.to_header()
    w2 = WCS.from_header(hdr)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 4088, 50)
    y = rng.uniform(0, 4088, 50)
    np.testing.assert_allclose(np.stack(w.pix2world(x, y)),
                               np.stack(w2.pix2world(x, y)), atol=1e-12)


def test_sip_roundtrip():
    sip_a = {(2, 0): 2.0e-7, (1, 1): -1.5e-7, (0, 2): 8.0e-8, (3, 0): 1e-11}
    sip_b = {(2, 0): -1.0e-7, (1, 1): 2.5e-7, (0, 2): -6.0e-8, (0, 3): -2e-11}
    w = WCS(ctype=("RA---TAN-SIP", "DEC--TAN-SIP"), crval=(150.0, 2.2),
            crpix=(2043.5, 2043.5),
            cd=np.array([[-3.0e-5, 0.0], [0.0, 3.0e-5]]), lonpole=180.0,
            sip_a=sip_a, sip_b=sip_b)
    rng = np.random.default_rng(3)
    x = rng.uniform(500, 3500, 100)
    y = rng.uniform(500, 3500, 100)
    ra, dec = w.pix2world(x, y)
    x2, y2 = w.world2pix(ra, dec)
    assert np.max(np.hypot(x2 - x, y2 - y)) < 1e-6
    # SIP distortion actually deflects (else the test is vacuous)
    w0 = WCS(ctype=("RA---TAN", "DEC--TAN"), crval=(150.0, 2.2), crpix=(2043.5, 2043.5),
             cd=w.cd, lonpole=180.0)
    ra0, dec0 = w0.pix2world(x, y)
    assert np.max(np.hypot((ra - ra0) * np.cos(np.deg2rad(dec)), dec - dec0)) * 3600 > 0.01


def test_jacobian_scale():
    """Jacobian singular values should be ~ the 0.11 arcsec pixel scale."""
    w = WCS(**SCA18)
    jac = local_partial_pixel_derivatives2(w, 2000.0, 2000.0)
    svals = np.linalg.svd(jac, compute_uv=False) * 3600.0
    assert np.all(np.abs(svals - 0.107) < 0.01)  # this linear WCS is ~0.105-0.108"


def test_pix_area():
    w = WCS(**SCA18)
    area = get_pix_area(w, np.array([2000.0]), np.array([2000.0]))
    pixscale = np.sqrt(area[0]) / (np.pi / 180 / 3600)  # arcsec
    assert abs(pixscale - 0.107) < 0.01


def _mini_cfg():
    return Config({
        "OBSFILE": "x", "INDATA": ["x", "L2_2506"], "CTR": [60.0504, -3.8],
        "LONPOLE": 240.0, "OUTSIZE": [4, 25, 0.04], "BLOCK": 2, "FILTER": 1,
        "INPSF": ["x", "L2_2506", 6], "OUT": "/tmp/x", "FADE": 1, "PAD": 0,
    })


def test_block_wcs_tiling():
    """Neighboring blocks share one projection: their grids abut exactly."""
    cfg = _mini_cfg()
    w00 = make_block_wcs(cfg, 0, 0)
    w10 = make_block_wcs(cfg, 1, 0)
    # rightmost column of block (0,0) and leftmost of (1,0) are adjacent:
    ra1, dec1 = w00.pix2world(cfg.NsideP - 1 + 1, 50.0)
    ra2, dec2 = w10.pix2world(cfg.NsideP - 1 + 1 - cfg.Nside, 50.0)
    assert np.hypot((ra1 - ra2) * np.cos(np.deg2rad(dec1)), dec1 - dec2) * 3600 < 1e-9


def test_stg_jax_matches_host():
    cfg = _mini_cfg()
    w = make_block_wcs(cfg, 1, 0)
    p2w, w2p = stg_projection_jax(
        (cfg.ra, cfg.dec), tuple(w.crpix), (-cfg.dtheta, cfg.dtheta), cfg.lonpole)
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 100, 64)
    y = rng.uniform(0, 100, 64)
    ra_h, dec_h = w.pix2world(x, y)
    ra_j, dec_j = np.asarray(p2w(x, y)[0]), np.asarray(p2w(x, y)[1])
    np.testing.assert_allclose(ra_j, ra_h, atol=1e-10)
    np.testing.assert_allclose(dec_j, dec_h, atol=1e-10)
    x2, y2 = w2p(ra_j, dec_j)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y2), y, atol=1e-8)


def test_fit_wcs_sip_approximates_arc():
    """TAN-SIP fit reproduces a distorted ARC WCS to sub-milli-pixel accuracy
    (the reference requires <1e-3 px for its GWCS approximation)."""
    from pyimcom_tpu.wcsutil import fit_wcs_sip

    src = WCS(**SCA18)
    fit = fit_wcs_sip(src.pix2world, 4088, order=3)
    rng = np.random.default_rng(7)
    x = rng.uniform(50, 4038, 200)
    y = rng.uniform(50, 4038, 200)
    ra1, dec1 = src.pix2world(x, y)
    x2, y2 = fit.world2pix(ra1, dec1)
    assert np.max(np.hypot(x2 - x, y2 - y)) < 1e-3


def test_pyimcom_wcs_wrapper():
    from pyimcom_tpu.wcsutil import PyIMCOM_WCS

    w = WCS(**SCA18)
    w2 = PyIMCOM_WCS(w.to_header())
    np.testing.assert_allclose(np.stack(w.pix2world(np.array([100.0]), np.array([200.0]))),
                               np.stack(w2.pix2world(np.array([100.0]), np.array([200.0]))),
                               atol=1e-12)
    # callables are dispatched to the error-map-corrected approximation
    # ('ASTROPY+' mode; see tests/test_wcsutil.py for accuracy)
    from pyimcom_tpu.wcsutil import SIPCorrectedWCS

    w3 = PyIMCOM_WCS(w.pix2world, nside=64, ngrid=16, err_step=8)
    assert isinstance(w3, SIPCorrectedWCS)
    with pytest.raises(TypeError):
        PyIMCOM_WCS(12345)
