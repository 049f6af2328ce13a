#!/usr/bin/env python
"""
Isolated device-phase microbenchmarks at production-block shapes.

The production group chain is ~12 s/group warm (waited out in
solve.download) while its matmul FLOPs are ~0.2-0.4 s and its downloads
are ~0.4 MB -- something else in the chain dominates.  This script times
each phase alone with block_until_ready at exactly the shapes a
production 2x2 group uses, so the next optimization targets the measured
cost, not a guess:

  sweep    : ops.assemble.sweep_scatter_scan, production rect volume
  pool_to_A: the element-scatter A assembly, production metadata volume
  solve    : solvers mixed/blocked Cholesky at n_pad=5248
  upload   : host->device coordinate/metadata transfer

Usage: python scripts/microbench_device.py [--n 5248] [--keys 45]
Writes one JSON line per phase; run on the real TPU (CPU numbers are not
transferable).
"""

import argparse
import json
import sys
import time

import numpy as np


def bench(fn, *args, warm=1, reps=3):
    import jax

    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5248,
                    help="padded per-stamp input-pixel count")
    ap.add_argument("--keys", type=int, default=45,
                    help="fresh submatrices per group")
    ap.add_argument("--L", type=int, default=383,
                    help="overlap window samples per axis")
    ap.add_argument("--stamps", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from pyimcom_tpu.ops import assemble

    n, K, L, S = args.n, args.keys, args.L, args.stamps
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend(), "n": n, "keys": K, "L": L}

    # ---- upload: one group's coordinate tables + scan metadata ------------
    tbl = rng.standard_normal(400_000)
    meta = rng.integers(0, 1 << 20, size=(300_000, 7), dtype=np.int32)
    t = bench(lambda a, b: (jnp.asarray(a), jnp.asarray(b)), tbl, meta)
    out["upload_s"] = round(t, 4)

    # ---- pool_to_A: production metadata volume ----------------------------
    # K submatrix uses x n^2 elements in 16384-element chunks
    CH = 16384
    rows_per_key = -(-n * n // CH)
    R = K * rows_per_key
    pool = jnp.asarray(rng.standard_normal(K * n * n).astype(np.float32))
    diag = jnp.zeros((S, n), dtype=jnp.float32)
    meta_rows = np.zeros((R, 7), np.int32)
    for k in range(K):
        base = k * n * n
        for r in range(rows_per_key):
            off = r * CH
            meta_rows[k * rows_per_key + r] = (
                base + off, n, 0, 0, min(CH, n * n - off), off,
                (k % S) * n * n)
    selmap = jnp.asarray(np.arange(n, dtype=np.int32))
    meta_d = jnp.asarray(meta_rows)

    def run_pool_to_A(pool_, meta_, sel_):
        # pool_to_A donates A: rebuild the (cheap) init each call
        A_ = assemble.init_A_batch(diag, n)
        return assemble.pool_to_A(A_, pool_, meta_, sel_, CH, n)

    t = bench(run_pool_to_A, pool, meta_d, selmap)
    gb = R * CH * 4 / 2 ** 30
    out["pool_to_A_s"] = round(t, 4)
    out["pool_to_A_GB"] = round(gb, 2)
    out["pool_to_A_GBps"] = round(gb / t, 2)

    # ---- sweep matmuls: the banded-weight dense interpolation -------------
    # one (n, L) @ (L, L) @ (L, n) chain per key at HIGHEST precision
    W1 = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))
    Sm = jnp.asarray(rng.standard_normal((L, L)).astype(np.float32))
    W2 = jnp.asarray(rng.standard_normal((L, n)).astype(np.float32))

    @jax.jit
    def sweep_chain(W1_, S_, W2_):
        import jax.lax as lax
        acc = jnp.zeros((), jnp.float32)
        def body(i, a):
            P = jnp.dot(jnp.dot(W1_, S_, precision=lax.Precision.HIGHEST),
                        W2_, precision=lax.Precision.HIGHEST)
            return a + P[0, 0]
        return lax.fori_loop(0, K, body, acc)

    t = bench(sweep_chain, W1, Sm, W2)
    out["sweep_matmul_s"] = round(t, 4)

    # ---- solve: mixed-precision Cholesky at production n ------------------
    from pyimcom_tpu.solvers import cholesky_solve_mixed

    A1 = rng.standard_normal((n, 64)).astype(np.float64)
    Apos = A1 @ A1.T / 64 + np.eye(n) * 10.0
    B = rng.standard_normal((1, 1444, n))
    t = bench(cholesky_solve_mixed, jnp.asarray(Apos),
              jnp.asarray(B), jnp.ones(1), jnp.asarray([5e-4]),
              1e-6, 0.5)
    out["solve_mixed_s_per_stamp"] = round(t, 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
