"""splitpsf tests: decomposition identity, kernel FITS layout, cache updates,
and the multi-kernel FFT convolution."""

import numpy as np
import pytest
import scipy.signal

from pyimcom_tpu.splitpsf.imsubtract import fftconvolve_multi
from pyimcom_tpu.splitpsf.splitpsf import SplitPSF, split_psf_to_fits
from pyimcom_tpu.splitpsf.update_cube import get_iteration, update


def _airy_cube(n=96, npoly=4):
    from pyimcom_tpu.ops.psfmodels import psf_cplx_airy

    cube = np.zeros((npoly, n, n))
    cube[0] = psf_cplx_airy(n, 6 * 1.326, sigma=6 * 0.2)
    if npoly > 1:
        cube[1] = 0.03 * np.roll(cube[0], 2, axis=0)  # weak spatial variation
    return cube


def test_window_limits():
    w = SplitPSF.window_integrated_blackman(np.array([-2.0, -1.0, 0.0, 1.0, 2.0]))
    np.testing.assert_allclose(w, [0, 0, 0.5, 1, 1], atol=1e-12)
    # monotone and smooth
    x = np.linspace(-1, 1, 201)
    wx = SplitPSF.window_integrated_blackman(x)
    assert np.all(np.diff(wx) >= -1e-12)


def test_decomposition_identity():
    """G (tophat-filtered) == G^S + K (*) Gamma + zeta at the Legendre nodes."""
    cube = _airy_cube()
    pars = {"oversamp": 6, "r_in": 3.0, "r_out": 7.0, "sigmaGamma": 1.0,
            "eps": 0.02, "tophat_in": True}
    sp = SplitPSF(cube, None, pars)
    sp.build()
    n = cube.shape[1]
    from scipy.special import eval_legendre, roots_legendre

    xL, _ = roots_legendre(sp.lorder + 1)
    xg, yg = (a.ravel() for a in np.meshgrid(xL, xL))
    for i in [0, sp.npoly - 1]:
        lr = np.arange(sp.lorder + 1)
        lpw = np.outer(eval_legendre(lr, yg[i]), eval_legendre(lr, xg[i])).ravel()
        G = np.einsum("a,aij->ij", lpw, sp.psfcube)
        GS_full = np.einsum("a,aij->ij", lpw,
                            sp.psfcube * SplitPSF.window_2d(n, 18, 42)[None])
        recon = (GS_full
                 + scipy.signal.convolve(sp.K_real[i],
                                         SplitPSF.gauss_stamp(n, sp.Cov[i]),
                                         mode="same", method="fft")
                 + sp.zeta_real[i])
        np.testing.assert_allclose(recon, G, atol=1e-10 * np.abs(G).max() + 1e-12)
        # the kernel term absorbs most of the wing power
        wings = G - GS_full
        assert np.linalg.norm(sp.zeta_real[i]) < 0.5 * np.linalg.norm(wings) + 1e-12


def test_split_psf_to_fits_layout(tmp_path):
    from pyimcom_tpu.fitsio import HDUList, ImageHDU, fits_read, fits_write

    cube = _airy_cube(n=64, npoly=1).astype(np.float32)
    hdus = HDUList([ImageHDU(None)] + [ImageHDU(cube) for _ in range(3)])
    fits_write(tmp_path / "psf_in.fits", hdus)
    out = split_psf_to_fits(str(tmp_path / "psf_in.fits"), None,
                            {"oversamp": 6, "tophat_in": True},
                            str(tmp_path / "psf_split.fits"))
    f = fits_read(out)
    # reference layout (splitpsf.py:287-397): originals, then short-range,
    # then kernels
    assert f[0].header["GSSKIP"] == 3
    assert f[0].header["KERSKIP"] == 6
    assert len(f) == 10  # primary + 3 originals + 3 shortrange + 3 kernels
    assert f[1].data.shape == cube.shape          # original passthrough
    np.testing.assert_allclose(f[1].data, cube, atol=1e-7)
    assert f[4].header["IMTYPE"].strip() == "Short range PSF"
    assert f[7].header["IMTYPE"].strip() == "Kernel K"
    assert "MAXZETA" in f[7].header and "KINT" in f[7].header
    assert f[0].header["MAXZETA"] >= 0

    # with SAVEZETA, the zeta cubes follow (ZETASKIP block)
    out2 = split_psf_to_fits(str(tmp_path / "psf_in.fits"), None,
                             {"oversamp": 6, "tophat_in": True,
                              "SAVEZETA": True},
                             str(tmp_path / "psf_split_z.fits"))
    f2 = fits_read(out2)
    assert f2[0].header["ZETASKIP"] == 9
    assert len(f2) == 13
    assert f2[10].data.shape == cube.shape


def test_fftconvolve_multi_matches_scipy():
    rng = np.random.default_rng(0)
    canvas = rng.normal(size=(64, 72))
    kernels = rng.normal(size=(3, 9, 11))
    out = fftconvolve_multi(canvas, kernels, use_jax=False)
    for k in range(3):
        want = scipy.signal.convolve(canvas, kernels[k], mode="valid")
        np.testing.assert_allclose(out[k], want, atol=1e-10)
    out_j = fftconvolve_multi(canvas, kernels, use_jax=None)
    np.testing.assert_allclose(out_j, out, atol=1e-8)


def test_update_cube(tmp_path):
    from pyimcom_tpu.config import Config

    cache = str(tmp_path / "cache" / "in")
    import os

    os.makedirs(tmp_path / "cache")
    # fabricate cached + subtracted files
    for obsid in [3, 7]:
        with open(f"{cache}_{obsid:08d}_01.fits", "w") as f:
            f.write("old")
        with open(f"{cache}_{obsid:08d}_01_subI.fits", "w") as f:
            f.write("new")
    cfg = Config({"OBSFILE": "x", "INDATA": ["x", "L2_fits"], "CTR": [0, 0],
                  "OUTSIZE": [4, 8, 0.04], "BLOCK": 1, "FILTER": 1,
                  "INPSF": ["x", "L2_fits", 6], "OUT": "x",
                  "INLAYERCACHE": cache})
    assert get_iteration(cache) == 0
    it = update(cfg)
    assert it == 1
    assert get_iteration(cache) == 1
    with open(f"{cache}_{3:08d}_01.fits") as f:
        assert f.read() == "new"
    # archive holds the old file
    with open(str(tmp_path / "cache" / "in.iter0" / "in_00000003_01.fits")) as f:
        assert f.read() == "old"
    # second update appends config history
    it = update(cfg)
    assert it == 2
    import json

    with open(cache + "_oldcfg.json") as f:
        hist = json.load(f)
    assert len(hist) == 2


def test_reinterp_and_bin2x2():
    """2x2 kernel binning (reference imsubtract.py:241-262, 360-384):
    reinterp halves the grid; the binned kernel conserves the integral
    (per native pixel area) for smooth kernels."""
    from pyimcom_tpu.splitpsf.imsubtract import bin_kernel_2x2, reinterp

    # reinterp sums 2x2 sample blocks (flux x4 per new sample) exactly for
    # linear functions: out[i, j] = 4 * lin(2i + 1.5, 2j + 1.5)
    y, x = np.mgrid[0:18, 0:18].astype(np.float64)
    lin = 2.0 + 0.3 * x - 0.1 * y
    out = reinterp(lin)
    assert out.shape == (8, 8)
    i, j = np.mgrid[0:8, 0:8].astype(np.float64)
    want = 4.0 * (2.0 + 0.3 * (2 * j + 1.5) - 0.1 * (2 * i + 1.5))
    np.testing.assert_allclose(out, want, atol=1e-10)

    # binning a smooth Gaussian kernel cube: the total kernel SUM is
    # conserved (each new sample carries the flux of its 2x2 block), so the
    # K (*) H convolution value is unchanged when H is sampled at ov/2
    ov = 6
    n = 8 * ov  # axis multiple of 2*oversamp
    yy, xx = np.mgrid[0:n, 0:n]
    c = (n - 1) / 2
    K = np.exp(-0.5 * ((xx - c) ** 2 + (yy - c) ** 2) / (1.5 * ov) ** 2)
    K = np.stack([K, 0.1 * K])
    Kb, ov2 = bin_kernel_2x2(K, ov)
    assert ov2 == ov // 2
    # the odd-oversamp branch trims one native pixel of wings, so sum
    # conservation holds to the trimmed flux (~2% for this wide Gaussian)
    assert abs(Kb[0].sum() / K[0].sum() - 1) < 0.03
    np.testing.assert_allclose(Kb[1], 0.1 * Kb[0], atol=1e-12)
    with pytest.raises(ValueError):
        bin_kernel_2x2(K, 5)


def test_fft_workers_env(monkeypatch):
    from pyimcom_tpu.splitpsf.imsubtract import fft_workers

    monkeypatch.delenv("PYIMCOM_FFT_WORKERS", raising=False)
    monkeypatch.delenv("SLURM_CPUS_PER_TASK", raising=False)
    monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
    assert fft_workers() == 1
    monkeypatch.setenv("SLURM_CPUS_PER_TASK", "4")
    assert fft_workers() == 4
    monkeypatch.setenv("PYIMCOM_FFT_WORKERS", "2")
    assert fft_workers() == 2
