"""
Piff PSF ingestion tests (reference tests/pyimcom/test_piff.py analog):
self-contained PixelGrid+BasisPolynomial reader, drawing accuracy,
Legendre-cube conversion, and an end-to-end block coadd with
INPSF format "piff" (BASELINE configs[3] ingest path).
"""

import numpy as np
import pytest

from pyimcom_tpu.utils.piffutils import (PiffPSFModel, piff_to_legendre,
                                         write_piff_file)


def _gauss_grid(size, sigma):
    c = (size - 1) / 2.0
    y, x = np.mgrid[0:size, 0:size]
    g = np.exp(-0.5 * ((x - c) ** 2 + (y - c) ** 2) / sigma ** 2)
    return g / g.sum()


def test_roundtrip_and_spatial_variation(tmp_path):
    """write_piff_file -> PiffPSFModel reproduces the polynomial params."""
    size, order = 15, 2
    nb = (order + 1) * (order + 2) // 2      # total-order basis size
    rng = np.random.default_rng(0)
    q = rng.standard_normal((size * size, nb))
    fname = str(tmp_path / "ffov_1.piff")
    write_piff_file(fname, q, size, order, scale=1.0)

    model = PiffPSFModel(fname, sca=3, nside=4088)
    assert model.size == size and model.order == order
    np.testing.assert_allclose(model.q, q, rtol=0, atol=1e-12)

    # params at a position match the direct polynomial evaluation
    x, y = 1000.0, 3000.0
    half = (4088 - 1) / 2.0
    u, v = (x - half) / half, (y - half) / half
    basis = np.array([u ** i * v ** j
                      for j in range(order + 1)
                      for i in range(order + 1 - j)])
    np.testing.assert_allclose(model.params(x, y).ravel(), q @ basis,
                               rtol=0, atol=1e-12)


def test_draw_reproduces_bandlimited_model(tmp_path):
    """Drawing a spatially constant Gaussian PixelGrid reproduces the
    analytic Gaussian to the interpolation-kernel accuracy."""
    size, sigma = 33, 3.0
    grid = _gauss_grid(size, sigma)
    fname = str(tmp_path / "ffov_7.piff")
    write_piff_file(fname, grid.ravel()[:, None], size, order=0, scale=1.0)
    model = PiffPSFModel(fname, sca=1)

    ov = 4
    stamp = model.draw(100.0, 200.0, stamp_size=size - 4, oversamp=ov)
    ns = stamp.shape[0]
    c = (ns - 1) / 2.0
    y, x = np.mgrid[0:ns, 0:ns]
    want = np.exp(-0.5 * (((x - c) / ov) ** 2 + ((y - c) / ov) ** 2)
                  / sigma ** 2)
    want = want / (2 * np.pi * sigma ** 2) / ov ** 2
    assert np.abs(stamp - want).max() < 1e-5 * want.max()
    # flux per sample: sums to ~1 over the footprint
    assert abs(stamp.sum() - 1.0) < 1e-3


def test_per_chip_solutions(tmp_path):
    size = 9
    g1 = _gauss_grid(size, 1.5).ravel()[:, None]
    g2 = 2.0 * g1
    fname = str(tmp_path / "ffov_2.piff")
    write_piff_file(fname, {0: g1, 4: g2}, size, order=0)
    m1 = PiffPSFModel(fname, sca=1)
    m5 = PiffPSFModel(fname, sca=5)
    np.testing.assert_allclose(2.0 * m1.params(10, 10), m5.params(10, 10),
                               rtol=0, atol=1e-12)


def test_piff_to_legendre_constant_model(tmp_path):
    """A spatially constant model yields a cube whose only nonzero plane is
    the constant term (the Legendre expansion of a constant)."""
    size = 17
    grid = _gauss_grid(size, 2.0)
    fname = str(tmp_path / "ffov_3.piff")
    write_piff_file(fname, grid.ravel()[:, None], size, order=0, scale=1.0)
    cube = piff_to_legendre(fname, sca=1, stamp_size=size - 4, oversamp=2,
                            legendre_order=1)
    assert cube.shape[0] == 4
    peak = np.abs(cube[0]).max()
    for k in [1, 2, 3]:
        assert np.abs(cube[k]).max() < 1e-6 * peak


@pytest.mark.slow
def test_block_with_piff_psf_input(tmp_path):
    """End-to-end: one output stamp coadds with INPSF format 'piff'
    (reference coadd.py:643-648 path); star recovery matches the Legendre
    run to the interpolation accuracy."""
    import jax

    from survey_fixture import build_survey
    from pyimcom_tpu.config import Config
    from pyimcom_tpu.coadd import Block
    from pyimcom_tpu.fitsio import fits_read
    from pyimcom_tpu.ops.psfmodels import smooth_and_pad

    cfg_dict = build_survey(tmp_path, n_obs=8, extrainput=["cstar14"],
                            config_overrides={"NPIXPSF": 16, "INPAD": 0.4})

    # convert each observation's (spatially constant) Legendre PSF cube into
    # a PixelGrid Piff solution: grid = tophat-smeared oversampled PSF,
    # grid spacing 1/8 native pixel, flux scaled by oversamp^2 so that
    # draw()'s per-sample convention matches the cube path
    ov = 8
    psfdir = cfg_dict["INPSF"][0]
    n_obs = 8
    for obsid in range(n_obs):
        f = fits_read(f"{psfdir}/psf_polyfit_{obsid:d}.fits")
        grids = {}
        for sca in range(1, 19):
            cube = np.asarray(f[sca].data, np.float64)
            sm = smooth_and_pad(cube[0], tophatwidth=ov) * ov ** 2
            grids[sca - 1] = sm.ravel()[:, None]
        size = sm.shape[0]
        write_piff_file(f"{psfdir}/ffov_{obsid:d}.piff", grids, size,
                        order=0, scale=1.0 / ov)

    d = dict(cfg_dict)
    d["INPSF"] = [psfdir, "piff", 8]
    d["STOP"] = 1
    d["OUT"] = d["OUT"] + "_piff"
    Block(cfg=Config(d), this_sub=1)

    out = fits_read(d["OUT"] + "_00_01.fits")
    fid = np.asarray(out["FIDELITY"].data, np.float64)
    uc = 10.0 ** (fid / -5000.0)
    good = (uc > 1e-10) & (uc < 0.5)
    assert np.any(good)
    # NPIXPSF=16 truncates the PSF wings, so the quality floor is looser
    # than the production 1e-6; the point is the ingest path runs end to
    # end and produces a sane solution.
    assert np.median(uc[good]) < 1e-2
