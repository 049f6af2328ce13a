"""Tests for the D5512 interpolation kernels (parity with reference routine.py contracts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyimcom_tpu.ops.interp import (
    d5512_weights,
    d5512_weights_np,
    grid_interp,
    interp2d,
    interp2d_multi,
    interp2d_np,
    interp2d_stack,
)


def scalar_reference(image, x, y):
    """Direct per-point transcription of the interpolation contract for testing."""
    ny, nx = image.shape
    out = np.zeros(len(x))
    for n in range(len(x)):
        xi = int(np.floor(x[n]))
        yi = int(np.floor(y[n]))
        if xi < 4 or xi >= nx - 5 or yi < 4 or yi >= ny - 5:
            continue
        wx = d5512_weights_np(np.array([x[n] - xi - 0.5]))[0]
        wy = d5512_weights_np(np.array([y[n] - yi - 0.5]))[0]
        patch = image[yi - 4:yi + 6, xi - 4:xi + 6]
        out[n] = wy @ patch @ wx
    return out


def test_weights_sum_to_one():
    fh = np.linspace(-0.5, 0.5, 101)
    w = np.asarray(d5512_weights(jnp.asarray(fh)))
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=2e-8)


def test_weights_symmetry():
    fh = np.linspace(-0.5, 0.5, 31)
    w_pos = d5512_weights_np(fh)
    w_neg = d5512_weights_np(-fh)
    np.testing.assert_allclose(w_pos, w_neg[:, ::-1], rtol=0, atol=1e-15)


def test_weights_jax_matches_numpy():
    fh = np.linspace(-0.5, 0.5, 57)
    np.testing.assert_allclose(np.asarray(d5512_weights(jnp.asarray(fh))),
                               d5512_weights_np(fh), rtol=0, atol=1e-14)


def test_interp2d_matches_scalar_reference():
    rng = np.random.default_rng(7)
    image = rng.normal(size=(40, 50))
    x = rng.uniform(0, 50, size=200)
    y = rng.uniform(0, 40, size=200)
    got = np.asarray(interp2d(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
    want = scalar_reference(image, x, y)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    np.testing.assert_allclose(interp2d_np(image, x, y), want, rtol=0, atol=1e-12)


def test_interp2d_bandlimited_accuracy():
    # D5512 is designed for Roman-band-limited signals; a low-frequency
    # sinusoid must be reproduced to high accuracy (cf. reference
    # tests/pyimcom/test_routine.py tolerances ~1e-9 vs C).
    ny = nx = 64
    yy, xx = np.mgrid[0:ny, 0:nx]
    rng = np.random.default_rng(3)
    x = rng.uniform(10, nx - 10, size=500)
    y = rng.uniform(10, ny - 10, size=500)
    for (kx, ky), atol in [((0.12, 0.07), 1e-5), ((0.05, 0.03), 1e-7)]:
        image = np.sin(2 * np.pi * (kx * xx + ky * yy))
        got = np.asarray(interp2d(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
        want = np.sin(2 * np.pi * (kx * x + ky * y))
        np.testing.assert_allclose(got, want, rtol=0, atol=atol)


def test_interp2d_off_grid_is_zero():
    image = np.ones((20, 20))
    x = np.array([0.5, 3.9, 15.1, 10.0, -2.0, 25.0])
    y = np.array([10.0, 10.0, 10.0, 3.0, 10.0, 10.0])
    got = np.asarray(interp2d(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
    # xi<4, xi<4, xi>=ngx-5, yi<4, off, off -> all zero except none valid here
    np.testing.assert_array_equal(got[[0, 1, 2, 3, 4, 5]], 0.0)
    got_ok = np.asarray(interp2d(jnp.asarray(image), jnp.asarray([10.0]), jnp.asarray([10.0])))
    np.testing.assert_allclose(got_ok, 1.0, atol=1e-12)


def test_interp2d_multi_and_stack_consistency():
    rng = np.random.default_rng(11)
    images = rng.normal(size=(3, 30, 30))
    x = rng.uniform(5, 24, size=100)
    y = rng.uniform(5, 24, size=100)
    multi = np.asarray(interp2d_multi(jnp.asarray(images), jnp.asarray(x), jnp.asarray(y)))
    for layer in range(3):
        single = np.asarray(interp2d(jnp.asarray(images[layer]), jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(multi[layer], single, rtol=0, atol=1e-13)
    which = rng.integers(0, 3, size=100).astype(np.int32)
    stacked = np.asarray(interp2d_stack(jnp.asarray(images), jnp.asarray(x), jnp.asarray(y),
                                        jnp.asarray(which)))
    np.testing.assert_allclose(stacked, multi[which, np.arange(100)], rtol=0, atol=1e-13)


def test_grid_interp_matches_pointwise():
    rng = np.random.default_rng(5)
    image = rng.normal(size=(40, 45))
    P, nyo, nxo = 7, 5, 6
    x = rng.uniform(6, 38, size=(P, nxo))
    y = rng.uniform(6, 33, size=(P, nyo))
    got = np.asarray(grid_interp(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
    for p in range(P):
        xx, yy = np.meshgrid(x[p], y[p])
        want = scalar_reference(image, xx.ravel(), yy.ravel()).reshape(nyo, nxo)
        np.testing.assert_allclose(got[p], want, rtol=0, atol=1e-12)


def test_grid_interp_off_grid_rows_cols_zero():
    image = np.ones((30, 30))
    x = np.array([[2.0, 15.0]])   # first column off-grid
    y = np.array([[15.0, 27.0]])  # second row off-grid
    got = np.asarray(grid_interp(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y)))
    assert got[0, 0, 0] == 0.0
    assert got[0, 1, 1] == 0.0
    assert got[0, 1, 0] == 0.0
    np.testing.assert_allclose(got[0, 0, 1], 1.0, atol=1e-12)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_dtype_follows_input(dtype):
    image = np.ones((20, 20), dtype=dtype)
    out = interp2d(jnp.asarray(image), jnp.asarray([10.0], dtype=dtype),
                   jnp.asarray([10.0], dtype=dtype))
    assert out.dtype == dtype


# ---------------------------------------------------------------------------
# G4460 kernel family (8x8 footprint; reference psfutil.py:52-87 selector,
# config key PSFINTERP -- docs/config_README.rst:189)
# ---------------------------------------------------------------------------


def test_g4460_weights_sum_and_symmetry():
    from pyimcom_tpu.ops.interp import kernel_weights, kernel_weights_np

    fh = np.linspace(-0.5, 0.5, 41)
    w = kernel_weights_np(fh, "G4460")
    assert w.shape == (41, 8)
    # partition of unity to the design tolerance
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, rtol=0, atol=5e-6)
    # mirror symmetry w(fh) == w(-fh)[::-1]
    np.testing.assert_allclose(w, kernel_weights_np(-fh, "G4460")[:, ::-1],
                               rtol=0, atol=1e-14)
    # jax twin agrees
    np.testing.assert_allclose(np.asarray(kernel_weights(jnp.asarray(fh), "G4460")),
                               w, rtol=0, atol=1e-14)


def test_g4460_bandlimited_accuracy():
    """Tone error <= 3.5e-6 for u <= 1/8 cycles/sample (design contract)."""
    from pyimcom_tpu.ops.interp import interp2d, interp2d_np

    rng = np.random.default_rng(7)
    ny = nx = 64
    yy, xx = np.mgrid[0:ny, 0:nx]
    x = rng.uniform(10, 50, 400)
    y = rng.uniform(10, 50, 400)
    for (u, v) in [(1 / 14, 1 / 16), (1 / 12, 0.0), (0.088, 0.088 / 2)]:
        image = np.cos(2 * np.pi * (u * xx + v * yy) + 0.37)
        want = np.cos(2 * np.pi * (u * x + v * y) + 0.37)
        got = np.asarray(interp2d(jnp.asarray(image), jnp.asarray(x),
                                  jnp.asarray(y), "G4460"))
        assert np.abs(got - want).max() < 3.5e-6
        np.testing.assert_allclose(interp2d_np(image, x, y, "G4460"), got,
                                   rtol=0, atol=1e-12)


def test_g4460_dense_matches_gather_path():
    from pyimcom_tpu.ops.interp import interp2d, interp2d_dense

    rng = np.random.default_rng(3)
    image = rng.standard_normal((40, 44))
    x = rng.uniform(0, 44, 300)   # includes off-grid queries
    y = rng.uniform(0, 40, 300)
    a = np.asarray(interp2d(jnp.asarray(image), jnp.asarray(x), jnp.asarray(y),
                            "G4460"))
    b = np.asarray(interp2d_dense(jnp.asarray(image)[None], jnp.asarray(x)[None],
                                  jnp.asarray(y)[None], "G4460"))[0]
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_g4460_grid_interp_matches_pointwise():
    from pyimcom_tpu.ops.interp import grid_interp, interp2d_np

    rng = np.random.default_rng(5)
    image = rng.standard_normal((32, 32))
    P, nyo, nxo = 3, 4, 5
    x = rng.uniform(8, 24, (P, nxo))
    y = rng.uniform(8, 24, (P, nyo))
    got = np.asarray(grid_interp(jnp.asarray(image), jnp.asarray(x),
                                 jnp.asarray(y), "G4460"))
    for p in range(P):
        xm, ym = np.meshgrid(x[p], y[p])
        want = interp2d_np(image, xm.ravel(), ym.ravel(), "G4460").reshape(nyo, nxo)
        np.testing.assert_allclose(got[p], want, rtol=0, atol=1e-12)


def test_psfinterp_config_selects_kernel():
    """PSFINTERP flows Config -> Block geometry -> sweep kernel."""
    from pyimcom_tpu.psfgrp import PSFGeometry

    geom = PSFGeometry(npixpsf=8, oversamp=4, dtheta=0.04 / 3600,
                       psfinterp="G4460")
    assert geom.psfinterp == "G4460"
    with pytest.raises(ValueError):
        PSFGeometry(npixpsf=8, oversamp=4, psfinterp="NOPE")

    from pyimcom_tpu.config import Config

    d = {"OBSFILE": "obs.fits", "INDATA": ["/tmp", "L2_fits"], "FILTER": 1,
         "INPSF": ["/tmp", "L2_fits", 8], "CTR": [60.0, -3.8], "BLOCK": 2,
         "OUTSIZE": [4, 25, 0.04], "OUT": "/tmp/x", "PSFINTERP": "G4460"}
    cfg = Config(d)
    assert cfg.psf_interp == "G4460"
    assert Config(cfg.to_dict()).psf_interp == "G4460"
