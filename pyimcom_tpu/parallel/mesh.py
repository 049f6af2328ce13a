"""
Device-mesh parallelism for the coaddition pipeline.

The reference framework's only multi-node strategy is embarrassingly
parallel Slurm job arrays over mosaic blocks plus process pools on a node
(SURVEY.md section 2.2; reference scripts/writejob_example.pl).  The
TPU-native replacement shards the *postage-stamp batch* axis over a
jax.sharding.Mesh: every device solves its shard of stamp systems, and the
mosaic-level quality summaries are reduced with collectives over ICI.

Blocks (the coarser axis) can additionally be scattered over hosts/slices
exactly as the reference scatters them over Slurm tasks; nothing in the
block computation couples blocks except the postage-pad halo, which is a
post-pass (reference analysis.py:1429-1467).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "stamps") -> Mesh:
    """1-D device mesh over the stamp-batch axis."""
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs, dtype=object).reshape(-1), (axis,))


def sharded_stamp_solve(mesh: Mesh, A_batch, mB_batch, C, kappaC,
                        ucmin: float, smax: float):
    """
    Solve a batch of per-stamp systems, sharded over the mesh.

    Parameters
    ----------
    A_batch : (S, n, n) -- stamp systems (S divisible by mesh size).
    mB_batch : (S, n_out, m, n)
    C : (n_out,)
    kappaC : (nv,)

    Returns
    -------
    T : (S, n_out, m, n) with the same sharding as the inputs;
    stats : dict of globally reduced quality summaries (max U/C, max Sigma,
        mean Sigma) computed with psum/pmax collectives over ICI.
    """
    from ..solvers import cholesky_solve

    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    A_batch = jax.device_put(A_batch, sh)
    mB_batch = jax.device_put(mB_batch, sh)
    C = jax.device_put(C, repl)
    kappaC = jax.device_put(kappaC, repl)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(), P(), P()),
    )
    def step(A_shard, mB_shard, C_, kC_):
        def solve_one(A, mB):
            return cholesky_solve(A, mB, C_, kC_, ucmin, smax)

        T, kappa, Sigma, UC = jax.vmap(solve_one)(A_shard, mB_shard)
        # global quality reductions over the stamp axis (ICI collectives)
        uc_max = jax.lax.pmax(jnp.max(UC), axis)
        sig_max = jax.lax.pmax(jnp.max(Sigma), axis)
        sig_sum = jax.lax.psum(jnp.sum(Sigma), axis)
        return T, uc_max, sig_max, sig_sum

    T, uc_max, sig_max, sig_sum = jax.jit(step)(A_batch, mB_batch, C, kappaC)
    S = A_batch.shape[0]
    m = mB_batch.shape[2]
    n_out = mB_batch.shape[1]
    stats = {
        "uc_max": float(uc_max),
        "sigma_max": float(sig_max),
        "sigma_mean": float(sig_sum) / (S * m * n_out),
    }
    return T, stats
