"""Metadetection tests: analytic interpolation quality and shear resampling."""

import numpy as np
import pytest

from pyimcom_tpu.meta.ginterp import InterpMatrix, MultiInterp


def test_interp_matrix_quality():
    """Leakage U and noise Sigma of the analytic interpolator are small for a
    well-sampled Gaussian PSF (reference ginterp contract)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, 64)
    y = rng.uniform(0, 1, 64)
    posx, posy, T, U, S = InterpMatrix(6.0, 4.0, x, y, [0.0, 0.0, 0.0])
    assert T.shape == (64, posx.size)
    np.testing.assert_allclose(T.sum(axis=1), 1.0, atol=1e-10)  # normalized
    assert np.max(U) < 1e-5
    assert np.max(S) < 1.0


def test_interp_matrix_smoothing_widens_psf():
    """With extra smoothing covariance, interpolating a Gaussian star image
    yields the analytically widened Gaussian."""
    sigma_pix = 4.0 / np.sqrt(8 * np.log(2))  # samp=4
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    x0 = y0 = 31.0
    img = np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * sigma_pix ** 2))

    Cxx = Cyy = 3.0
    out, mask, Umax, Smax = MultiInterp(
        img, np.zeros_like(img, dtype=bool), (n, n), np.array([0.0, 0.0]),
        np.identity(2), 6.0, 4.0, [Cxx, 0.0, Cyy])
    # fit the output width
    tot = out.sum()
    cx = (out * xx).sum() / tot
    cy = (out * yy).sum() / tot
    vxx = (out * (xx - cx) ** 2).sum() / tot
    want = sigma_pix ** 2 + Cxx
    assert abs(vxx - want) / want < 0.02
    assert Umax < 1e-4


def test_multiinterp_identity_resample():
    """Identity transform with zero smoothing reproduces a smooth image."""
    n = 48
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    img = np.sin(xx / 7.0) + np.cos(yy / 9.0)
    out, mask, Umax, Smax = MultiInterp(
        img, np.zeros_like(img, dtype=bool), (n, n), np.array([0.0, 0.0]),
        np.identity(2), 6.0, 4.0, [0.0, 0.0, 0.0])
    good = ~mask
    assert good.sum() > 0.5 * n * n
    np.testing.assert_allclose(out[good], img[good], atol=2e-3)


def test_multiinterp_shift():
    """A half-pixel shift moves the image by half a pixel."""
    n = 48
    sigma = 3.0
    yy, xx = np.mgrid[0:n, 0:n].astype(float)
    img = np.exp(-((xx - 24.0) ** 2 + (yy - 24.0) ** 2) / (2 * sigma ** 2))
    out, mask, _, _ = MultiInterp(
        img, np.zeros_like(img, dtype=bool), (n, n), np.array([0.5, 0.25]),
        np.identity(2), 6.0, 4.0, [0.0, 0.0, 0.0])
    tot = out[~mask].sum()
    cx = (out * xx)[~mask].sum() / tot
    cy = (out * yy)[~mask].sum() / tot
    assert abs(cx - 23.5) < 0.02   # x_in = x_out + 0.5 -> feature moves -0.5
    assert abs(cy - 23.75) < 0.02


def test_multiinterp_mask_propagates():
    n = 48
    img = np.ones((n, n))
    inmask = np.zeros((n, n), dtype=bool)
    inmask[20:24, 20:24] = True
    out, mask, _, _ = MultiInterp(
        img, inmask, (n, n), np.array([0.0, 0.0]),
        np.identity(2), 4.0, 4.0, [0.0, 0.0, 0.0])
    assert mask[21, 21]
    assert np.all(out[mask] == 0.0)
