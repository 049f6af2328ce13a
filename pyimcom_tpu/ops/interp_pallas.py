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

VMEM footprint per program: image (~300 KB for a 275^2 overlap) + two
(BLOCK_Q, ncol) scratch bands (~560 KB at BLOCK_Q=256) -- comfortably under
the ~16 MB budget, with zero HBM traffic for the weights.

Contract matches ops.interp.interp2d_dense exactly (tested in interpret
mode); enable in the pipeline with PYIMCOM_PALLAS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp import _HI_MARGIN, _LO, D5512_EVEN, D5512_ODD, KERNEL_SIZE

BLOCK_Q = 256


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


def _band(xq, ncol):
    """(Q, ncol) banded weight matrix + validity for one query block."""
    xi = jnp.floor(xq).astype(jnp.int32)
    valid = (xi >= _LO) & (xi < ncol - _HI_MARGIN)
    fh = xq - xi.astype(xq.dtype) - 0.5
    taps = _weights10(fh)                                  # list of 10 x (Q,)
    cols = jax.lax.broadcasted_iota(jnp.int32, (xq.shape[0], ncol), 1)
    k = cols - xi[:, None] + _LO                           # (Q, ncol)
    W = jnp.zeros((xq.shape[0], ncol), dtype=xq.dtype)
    for tap in range(KERNEL_SIZE):
        W = W + jnp.where(k == tap, taps[tap][:, None], 0.0)
    return W, valid


def _kernel(img_ref, x_ref, y_ref, out_ref):
    img = img_ref[0]                                       # (ny, nx) VMEM
    ny, nx = img.shape
    xq = x_ref[0]                                          # (Q,)
    yq = y_ref[0]
    Wy, vy = _band(yq, ny)                                 # (Q, ny)
    Wx, vx = _band(xq, nx)                                 # (Q, nx)
    G = jnp.dot(Wy, img, preferred_element_type=img.dtype,
                precision=jax.lax.Precision.HIGHEST)       # MXU (Q, nx)
    out = jnp.sum(G * Wx, axis=-1)
    out_ref[0] = jnp.where(vx & vy, out, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def interp2d_dense_pallas(images: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """
    Same contract as ops.interp.interp2d_dense: images (R, ny, nx),
    x, y (R, Nq) -> (R, Nq), zero off-grid.  Nq must be a multiple of
    BLOCK_Q (the callers' bucket sizes are).
    """
    R, ny, nx = images.shape
    _, Nq = x.shape
    if Nq % BLOCK_Q:
        raise ValueError(f"Nq={Nq} must be a multiple of {BLOCK_Q}")
    nq_blocks = Nq // BLOCK_Q

    grid = (R, nq_blocks)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ny, nx), lambda r, q: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q), lambda r, q: (r, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q), lambda r, q: (r, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q), lambda r, q: (r, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Nq), images.dtype),
        interpret=interpret,
    )(images, x, y)


def pallas_enabled() -> bool:
    """Pallas interp path toggle (PYIMCOM_PALLAS=1) -- TPU only."""
    import os

    return (os.environ.get("PYIMCOM_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu")
