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


def sync(r):
    """Force completion of the queue that produced r.

    block_until_ready is a NO-OP over the axon relay (returns in ~us while
    the device queue is still draining); the only real synchronization
    point is a data fetch.  Pull ONE element of one leaf -- the producing
    program must finish before the element exists, and the download itself
    is negligible.
    """
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0:1])


def bench(fn, *args, warm=1, reps=3):
    for _ in range(warm):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5248,
                    help="padded per-stamp input-pixel count")
    ap.add_argument("--keys", type=int, default=45,
                    help="fresh submatrices per group")
    ap.add_argument("--nsub", type=int, default=1088,
                    help="rung-padded instamp pixel count (submatrix dim)")
    ap.add_argument("--L", type=int, default=383,
                    help="overlap window samples per axis")
    ap.add_argument("--stamps", type=int, default=4)
    ap.add_argument("--scatter", action="store_true",
                    help="also time the element-scatter pool_to_A path "
                         "(compiles for many minutes at production volume; "
                         "known to OOM in compile when unchunked)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    repo = __file__.rsplit("/", 2)[0] or "."
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", repo + "/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
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
    print("[mb]", "upload_s", out.get("upload_s"), flush=True)

    # ---- A assembly: scatter vs selection-matmul at production shapes -----
    # A production group: ~45 fresh submatrices of ~(nsub, nsub) each
    # (instamp pixel counts), used ~4x (once per stamp of the 2x2 group)
    # = `uses` placements into S stamp matrices of n_pad = n.
    nsub = args.nsub
    uses = 4 * K
    CH = 16384
    pool = jnp.asarray(
        rng.standard_normal(K * nsub * nsub).astype(np.float32))
    diag = jnp.zeros((S, n), dtype=jnp.float32)
    # selection: each instamp's nsub pixels -> a contiguous A slot range
    # (9 instamps per stamp; every placement targets a random instamp pair)
    selmap_np = np.full(9 * nsub, -1, np.int32)
    nsel = n // 9
    for piece in range(9):
        idx = np.sort(rng.choice(nsub, size=min(nsel, nsub), replace=False))
        selmap_np[piece * nsub + idx] = piece * nsel + np.arange(len(idx))
    selmap = jnp.asarray(selmap_np)

    if args.scatter:
        # scatter path: chunked meta rows per use
        rows = []
        for u in range(uses):
            base = (u % K) * nsub * nsub
            m1, m2 = (u % 9) * nsub, ((u * 5 + 3) % 9) * nsub
            dstA = (u % S) * n * n
            for off in range(0, nsub * nsub, CH):
                rows.append((base + off, nsub, m1, m2,
                             min(CH, nsub * nsub - off), off, dstA))
        meta_d = jnp.asarray(np.asarray(rows, np.int32))

        def run_pool_to_A(pool_, meta_, sel_):
            # pool_to_A donates A: rebuild the (cheap) init each call
            A_ = assemble.init_A_batch(diag, n)
            return assemble.pool_to_A(A_, pool_, meta_, sel_, CH, n)

        t = bench(run_pool_to_A, pool, meta_d, selmap)
        gel = uses * nsub * nsub / 1e9
        out["pool_to_A_s"] = round(t, 4)
        print("[mb]", "pool_to_A_s", out.get("pool_to_A_s"), flush=True)
        out["pool_to_A_Gelem"] = round(gel, 3)
        print("[mb]", "pool_to_A_Gelem", out.get("pool_to_A_Gelem"), flush=True)
        out["pool_to_A_Geps"] = round(gel / t, 3)
        print("[mb]", "pool_to_A_Geps", out.get("pool_to_A_Geps"), flush=True)

    # matmul path: one use row per placement (sym covers the off-diagonal
    # double write; time the sym variant, the more expensive one)
    uses_mm = np.zeros((uses, 5), np.int32)
    for u in range(uses):
        uses_mm[u] = ((u % K) * nsub * nsub, (u % 9) * nsub,
                      ((u * 5 + 3) % 9) * nsub, u % S, 1)
    uses_d = jnp.asarray(uses_mm)

    def run_pool_to_A_mm(pool_, uses_, sel_):
        A_ = assemble.init_A_batch(diag, n)
        return assemble.pool_to_A_mm(A_, pool_, uses_, sel_,
                                     nsub, nsub, n, True)

    t = bench(run_pool_to_A_mm, pool, uses_d, selmap)
    fl = uses * 2 * (nsub * nsub * n + n * n * nsub) / 1e12
    out["pool_to_A_mm_s"] = round(t, 4)
    print("[mb]", "pool_to_A_mm_s", out.get("pool_to_A_mm_s"), flush=True)
    out["pool_to_A_mm_TFLOP"] = round(fl, 2)
    print("[mb]", "pool_to_A_mm_TFLOP", out.get("pool_to_A_mm_TFLOP"), flush=True)
    out["pool_to_A_mm_TFLOPs"] = round(fl / t, 2)
    print("[mb]", "pool_to_A_mm_TFLOPs", out.get("pool_to_A_mm_TFLOPs"), flush=True)

    # dus path: compaction matmuls stay (nsub, nsub); the write is a
    # dynamic-slice add into a margin-padded canvas
    uses_dus = np.zeros((uses, 7), np.int32)
    for u in range(uses):
        uses_dus[u] = ((u % K) * nsub * nsub, (u % 9) * nsub,
                       ((u * 5 + 3) % 9) * nsub, u % S, 1,
                       (u % 9) * nsel, ((u * 5 + 3) % 9) * nsel)
    uses_dus_d = jnp.asarray(uses_dus)
    NC = n + nsub

    def run_pool_to_A_dus(pool_, uses_, sel_):
        cv = assemble.init_A_canvas(diag, n, NC)
        cv = assemble.pool_to_A_dus(cv, pool_, uses_, sel_,
                                    nsub, nsub, NC, True)
        return assemble.canvas_to_A(cv, n)

    t = bench(run_pool_to_A_dus, pool, uses_dus_d, selmap)
    fl = uses * 2 * (2 * nsub * nsub * nsub) / 1e12
    out["pool_to_A_dus_s"] = round(t, 4)
    print("[mb]", "pool_to_A_dus_s", out.get("pool_to_A_dus_s"), flush=True)
    out["pool_to_A_dus_TFLOP"] = round(fl, 2)
    print("[mb]", "pool_to_A_dus_TFLOP", out.get("pool_to_A_dus_TFLOP"), flush=True)
    out["pool_to_A_dus_TFLOPs"] = round(fl / t, 2)
    print("[mb]", "pool_to_A_dus_TFLOPs", out.get("pool_to_A_dus_TFLOPs"), flush=True)

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
    print("[mb]", "sweep_matmul_s", out.get("sweep_matmul_s"), flush=True)

    # ---- solve: mixed-precision Cholesky at production n ------------------
    from pyimcom_tpu.solvers import cholesky_solve_mixed

    A1 = rng.standard_normal((n, 64)).astype(np.float64)
    Apos = A1 @ A1.T / 64 + np.eye(n) * 10.0
    B = rng.standard_normal((1, 1444, n))
    t = bench(cholesky_solve_mixed, jnp.asarray(Apos),
              jnp.asarray(B), jnp.ones(1), jnp.asarray([5e-4]),
              1e-6, 0.5)
    out["solve_mixed_s_per_stamp"] = round(t, 4)
    print("[mb]", "solve_mixed_s_per_stamp", out.get("solve_mixed_s_per_stamp"), flush=True)

    # ---- link/dispatch overhead probes -------------------------------------
    # Per-program dispatch cost over the relay: (a) serial -- dispatch one
    # trivial program and force completion; (b) pipelined -- enqueue 32
    # trivial programs then force one completion.  The difference between
    # (a) and (b)/32 is the latency jax's async dispatch hides; (b)/32 is
    # the FLOOR a production group pays per enqueued program even when
    # perfectly pipelined (a group enqueues ~20-60 programs).
    tiny = jnp.zeros(128, jnp.float32)

    @jax.jit
    def bump(v):
        return v + 1.0

    sync(bump(tiny))  # compile
    t0 = time.perf_counter()
    for _ in range(8):
        sync(bump(tiny))
    out["dispatch_serial_s"] = round((time.perf_counter() - t0) / 8, 5)
    print("[mb]", "dispatch_serial_s", out.get("dispatch_serial_s"), flush=True)
    t0 = time.perf_counter()
    v = tiny
    for _ in range(32):
        v = bump(v)
    sync(v)
    out["dispatch_pipelined_s"] = round((time.perf_counter() - t0) / 32, 5)
    print("[mb]", "dispatch_pipelined_s", out.get("dispatch_pipelined_s"), flush=True)

    # Small-transfer cost: a KB-scale device_put (scan metadata row block)
    small = np.zeros((1024,), np.int32)
    t0 = time.perf_counter()
    for _ in range(8):
        sync(jnp.asarray(small))
    out["device_put_4KB_s"] = round((time.perf_counter() - t0) / 8, 5)
    print("[mb]", "device_put_4KB_s", out.get("device_put_4KB_s"), flush=True)

    # Batched vs sequential puts: a production group uploads ~50 small
    # arrays; if one device_put(pytree) call costs much less than N
    # sequential calls, batching the group's uploads into one call hides
    # the per-call relay round trip.
    small16 = [np.full(1024, i, np.int32) for i in range(16)]
    t0 = time.perf_counter()
    for a in small16:
        sync(jnp.asarray(a))
    out["puts_16_sequential_s"] = round(time.perf_counter() - t0, 4)
    print("[mb]", "puts_16_sequential_s", out.get("puts_16_sequential_s"), flush=True)
    t0 = time.perf_counter()
    sync(jax.device_put(small16))
    out["puts_16_pytree_s"] = round(time.perf_counter() - t0, 4)
    print("[mb]", "puts_16_pytree_s", out.get("puts_16_pytree_s"), flush=True)

    # Whether device_put of the full group tables BLOCKS the host: enqueue
    # the upload and return immediately vs force completion.  A large gap
    # means uploads already overlap compute (the host is free); parity
    # means the host stalls for the full transfer.
    t0 = time.perf_counter()
    h1 = jnp.asarray(tbl)
    h2 = jnp.asarray(meta)
    out["upload_enqueue_s"] = round(time.perf_counter() - t0, 4)
    print("[mb]", "upload_enqueue_s", out.get("upload_enqueue_s"), flush=True)
    sync((h1, h2))
    out["upload_total_s"] = round(time.perf_counter() - t0, 4)
    print("[mb]", "upload_total_s", out.get("upload_total_s"), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
