"""Pallas interpolation kernel vs the XLA dense formulation (interpret mode)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def test_pallas_matches_dense():
    import jax.numpy as jnp

    from pyimcom_tpu.ops.interp import interp2d_dense
    from pyimcom_tpu.ops.interp_pallas import interp2d_dense_pallas

    rng = np.random.default_rng(0)
    # production shapes: f32 images, f64 query positions, R multiple of 8
    R, Nq, ns = 8, 1024, 275
    imgs = jnp.asarray(rng.normal(size=(R, ns, ns)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-10, ns + 10, (R, Nq)))
    y = jnp.asarray(rng.uniform(-10, ns + 10, (R, Nq)))
    ref = np.asarray(interp2d_dense(imgs, x, y))
    pal = np.asarray(interp2d_dense_pallas(imgs, x, y, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, rtol=0, atol=3e-6 * scale)
    # off-grid zeros preserved exactly
    np.testing.assert_array_equal(pal == 0.0, ref == 0.0)


def test_pallas_rejects_unaligned():
    import jax.numpy as jnp

    from pyimcom_tpu.ops.interp_pallas import interp2d_dense_pallas

    imgs = jnp.zeros((1, 32, 32), dtype=jnp.float32)
    with pytest.raises(ValueError):
        interp2d_dense_pallas(imgs, jnp.zeros((1, 100), jnp.float32),
                              jnp.zeros((1, 100), jnp.float32), interpret=True)
