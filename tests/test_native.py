"""
Native C++ host kernels: parity against the numpy twins and graceful
degradation (pyimcom_tpu/native; reference parity target: furry_parakeet's
pyimcom_croutines / pyimcom_interface C functions, SURVEY.md section 2.3).
"""

import numpy as np
import pytest

from pyimcom_tpu import native
from pyimcom_tpu.ops import interp as oi


def _pure_interp2d_np(image, x, y, kern):
    """The inline numpy path of interp2d_np, bypassing the native route."""
    _e, _o, size, lo, hi = oi.KERNEL_FAMILIES[kern]
    image = np.asarray(image, dtype=np.float64)
    ny, nx = image.shape
    xi = np.floor(x).astype(np.int64)
    yi = np.floor(y).astype(np.int64)
    valid = (xi >= lo) & (xi < nx - hi) & (yi >= lo) & (yi < ny - hi)
    xi_s = np.clip(xi, lo, nx - hi - 1)
    yi_s = np.clip(yi, lo, ny - hi - 1)
    wx = oi.kernel_weights_np(x - xi - 0.5, kern)
    wy = oi.kernel_weights_np(y - yi - 0.5, kern)
    offs = np.arange(size) - lo
    patch = image[(yi_s[:, None, None] + offs[None, :, None]),
                  (xi_s[:, None, None] + offs[None, None, :])]
    return np.where(valid, np.einsum("nij,ni,nj->n", patch, wy, wx), 0.0)


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no host compiler")


@needs_native
@pytest.mark.parametrize("kern", ["D5512", "G4460"])
def test_interp2d_native_matches_numpy(kern):
    rng = np.random.default_rng(3)
    img = rng.standard_normal((40, 37))
    n = 500
    # interior, boundary-straddling, and far out-of-range queries
    x = rng.uniform(-3, 40, n)
    y = rng.uniform(-3, 43, n)
    ref = _pure_interp2d_np(img, x, y, kern)
    got = native.interp2d_multi(img, x, y, kern)[0]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12 * np.abs(ref).max())


@needs_native
def test_interp2d_multi_layers():
    rng = np.random.default_rng(4)
    imgs = rng.standard_normal((3, 30, 31))
    x = rng.uniform(5, 24, 200)
    y = rng.uniform(5, 23, 200)
    got = native.interp2d_multi(imgs, x, y, "D5512")
    for layer in range(3):
        ref = _pure_interp2d_np(imgs[layer], x, y, "D5512")
        np.testing.assert_allclose(got[layer], ref, atol=1e-13)


@needs_native
def test_interp2d_np_routes_native():
    """interp2d_np returns native results when the library is present."""
    rng = np.random.default_rng(5)
    img = rng.standard_normal((25, 25))
    x = rng.uniform(6, 18, 50)
    y = rng.uniform(6, 18, 50)
    np.testing.assert_allclose(oi.interp2d_np(img, x, y),
                               _pure_interp2d_np(img, x, y, "D5512"),
                               atol=1e-13)


@needs_native
@pytest.mark.parametrize("weighted", [False, True])
def test_bilinear_gather_native_matches_numpy(weighted, monkeypatch):
    from pyimcom_tpu import imdestripe as d

    rng = np.random.default_rng(6)
    img = rng.standard_normal((20, 22))
    geff = rng.uniform(0.5, 2.0, img.shape) if weighted else None
    xf = rng.uniform(-2, 23, 300)
    yf = rng.uniform(-2, 21, 300)
    got = native.bilinear_gather(img, xf, yf, geff)
    monkeypatch.setattr(native, "available", lambda: False)
    ref = d._bilinear_gather_np(img, xf, yf, geff)
    np.testing.assert_allclose(got, ref, atol=1e-13)


@needs_native
def test_bilinear_adjoint_dot_product():
    """<gather(img), v> == <img, scatter_adjoint(v)> (the reference's
    dot-product test for the C pair, test_imdestripe.py:258)."""
    rng = np.random.default_rng(7)
    img = rng.standard_normal((18, 19))
    xf = rng.uniform(-1, 20, 250)
    yf = rng.uniform(-1, 19, 250)
    v = rng.standard_normal(250)
    lhs = np.dot(native.bilinear_gather(img, xf, yf), v)
    rhs = np.sum(img * native.bilinear_scatter_adjoint(v, xf, yf, img.shape))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)


def test_graceful_fallback(monkeypatch):
    """Callers fall back to numpy when the native library is absent."""
    monkeypatch.setattr(native, "available", lambda: False)
    rng = np.random.default_rng(8)
    img = rng.standard_normal((25, 25))
    x = rng.uniform(6, 18, 50)
    y = rng.uniform(6, 18, 50)
    np.testing.assert_allclose(oi.interp2d_np(img, x, y),
                               _pure_interp2d_np(img, x, y, "D5512"),
                               atol=0)
