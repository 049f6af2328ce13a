"""
Pallas TPU kernel for banded-weight interpolation.

The XLA dense formulation (ops.interp.interp2d_dense) materializes the
(N, ncol) banded weight matrix in HBM between the VPU build and the MXU
matmul.  This kernel fuses the two per query tile: for each (rectangle,
query-block) grid cell it

  1. computes the D5512 tap weights on the VPU,
  2. expands them into a (BLOCK_Q, ncol) band held only in VMEM,
  3. row-interpolates with one MXU matmul against the rectangle's source
     image (resident in VMEM), and
  4. contracts the column band elementwise.

Tiles cover BLOCK_R=8 rectangles x BLOCK_Q=128 queries (Mosaic requires the
last two block dims divisible by (8, 128) or matching the array).  VMEM per
program: 8 images (~2.6 MB for 287^2 overlaps) + (8, 128, ncol) bands
(~2.4 MB) -- well under the ~16 MB budget, with zero HBM traffic for the
weights.  Mosaic has no 64-bit types, so the jit wrapper splits the f64
query positions into (int32 cell, f32 phase) before the kernel; |phase| <=
0.5 keeps 3e-8 phase precision in f32.

Contract matches ops.interp.interp2d_dense exactly (tested in interpret
mode); enable in the pipeline with PYIMCOM_PALLAS=1.  NOTE: on the axon
remote-TPU relay the Mosaic compile service is unavailable
(tpu_compile_helper cannot initialize libtpu), so this path currently
validates in interpret mode only; the XLA dense formulation is the
production default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp import _HI_MARGIN, _LO, D5512_EVEN, D5512_ODD, KERNEL_SIZE

# Mosaic requires the last two block dims to be divisible by (8, 128) or
# match the array, so tiles cover 8 rectangles x 128 queries.
BLOCK_R = 8
BLOCK_Q = 128


def _weights10(fh):
    """
    List of 10 per-tap D5512 weights from the fractional phase.

    Coefficients are baked in as scalar immediates (Horner evaluation), so
    the Pallas kernel captures no array constants.
    """
    fh2 = fh * fh
    taps = [None] * KERNEL_SIZE
    for row in range(5):
        ec = [float(c) for c in D5512_EVEN[row]]
        oc = [float(c) for c in D5512_ODD[row]]
        e = ec[0]
        for c in ec[1:]:
            e = e * fh2 + c
        o = oc[0]
        for c in oc[1:]:
            o = o * fh2 + c
        o = o * fh
        taps[row] = e + o
        taps[KERNEL_SIZE - 1 - row] = e - o
    return taps


def _band(xi, fh, ncol):
    """(..., ncol) banded weight matrix + validity from split positions."""
    valid = (xi >= _LO) & (xi < ncol - _HI_MARGIN)
    taps = _weights10(fh)                                  # list of 10 x fh.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, fh.shape + (ncol,), fh.ndim)
    k = cols - xi[..., None] + _LO                         # (..., ncol)
    W = jnp.zeros(fh.shape + (ncol,), dtype=fh.dtype)
    for tap in range(KERNEL_SIZE):
        W = W + jnp.where(k == tap, taps[tap][..., None], 0.0)
    return W, valid


def _kernel(img_ref, xi_ref, fx_ref, yi_ref, fy_ref, out_ref):
    img = img_ref[...]                                     # (BLOCK_R, ny, nx)
    ny, nx = img.shape[-2:]
    # Mosaic has no 64-bit types: the wrapper extracts the integer cell and
    # the fractional phase in f64 under XLA and passes (int32, f32) pairs
    # (|phase| <= 0.5 keeps 3e-8 precision in f32)
    Wy, vy = _band(yi_ref[...], fy_ref[...], ny)           # (R, Q, ny)
    Wx, vx = _band(xi_ref[...], fx_ref[...], nx)           # (R, Q, nx)
    G = jax.lax.dot_general(Wy, img, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=img.dtype,
                            precision=jax.lax.Precision.HIGHEST)  # (R, Q, nx)
    out = jnp.sum(G * Wx, axis=-1)
    out_ref[...] = jnp.where(vx & vy, out, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def interp2d_dense_pallas(images: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """
    Same contract as ops.interp.interp2d_dense: images (R, ny, nx),
    x, y (R, Nq) -> (R, Nq), zero off-grid.  R must be a multiple of
    BLOCK_R and Nq of BLOCK_Q (the callers' batch/bucket sizes are).
    """
    R, ny, nx = images.shape
    _, Nq = x.shape
    if Nq % BLOCK_Q or R % BLOCK_R:
        raise ValueError(f"(R, Nq)=({R}, {Nq}) must be multiples of "
                         f"({BLOCK_R}, {BLOCK_Q})")

    # split in the query dtype (f64 in the pipeline) before entering Mosaic
    xi = jnp.floor(x)
    yi = jnp.floor(y)
    fx = (x - xi - 0.5).astype(jnp.float32)
    fy = (y - yi - 0.5).astype(jnp.float32)
    xi = xi.astype(jnp.int32)
    yi = yi.astype(jnp.int32)

    grid = (R // BLOCK_R, Nq // BLOCK_Q)
    qspec = pl.BlockSpec((BLOCK_R, BLOCK_Q), lambda r, q: (r, q),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_R, ny, nx), lambda r, q: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec, qspec, qspec, qspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((R, Nq), images.dtype),
        interpret=interpret,
    )(images, xi, fx, yi, fy)


@functools.partial(jax.jit, static_argnames=("bucket", "interpret"))
def interp2d_dense_pairs_pallas(images, xt, yt, meta, inv_scale, off_grid,
                                bucket: int, interpret: bool = False):
    """
    Outer-difference-query variant (same contract as
    ops.interp.interp2d_dense_pairs): queries are formed on device in f64
    under XLA, then interpolated by the Pallas kernel.
    """
    j = jnp.arange(bucket, dtype=jnp.int32)[None, :]
    f = meta[:, 3:4] + j
    w2 = jnp.maximum(meta[:, 2:3], 1)
    i1 = meta[:, 0:1] + f // w2
    i2 = meta[:, 1:2] + f % w2
    valid = j < meta[:, 4:5]
    i1 = jnp.where(valid, i1, 0)
    i2 = jnp.where(valid, i2, 0)
    qx = jnp.where(valid, (xt[i1] - xt[i2]) * inv_scale + off_grid, -100.0)
    qy = jnp.where(valid, (yt[i1] - yt[i2]) * inv_scale + off_grid, -100.0)
    return interp2d_dense_pallas(images, qx, qy, interpret)


def pallas_enabled() -> bool:
    """Pallas interp path toggle (PYIMCOM_PALLAS=1) -- TPU only."""
    import os

    return (os.environ.get("PYIMCOM_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu")
