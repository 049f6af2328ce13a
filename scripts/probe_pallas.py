#!/usr/bin/env python
"""
Minimal Pallas/Mosaic compile probe for the remote-TPU relay.

Attempts to compile + run the smallest possible Pallas TPU program (one
8x128 f32 copy) on the default accelerator, with and without the
TPU_WORKER_HOSTNAMES workaround, and prints a JSON verdict.  Each attempt
runs in its own subprocess (backend init is once-per-process, and the
relay can hang inside the compile RPC, so children get a hard timeout).

Evidence for the SURVEY section 7 P1 decision: if Mosaic compiles here,
the banded interpolation kernel (pyimcom_tpu/ops/interp_pallas.py) can be
benchmarked at production shapes with PYIMCOM_PALLAS=1; if not, the
kernel stays an interpret-mode reference implementation and the XLA dense
formulation remains the production default.

Usage: python scripts/probe_pallas.py
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, traceback
try:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    y = run(jnp.zeros((8, 128), jnp.float32))
    np.testing.assert_allclose(np.asarray(y), 1.0)
    print(json.dumps({"ok": True, "backend": jax.default_backend()}))
except BaseException as e:
    print(json.dumps({
        "ok": False,
        "error": f"{type(e).__name__}: {e}"[:500],
        "trace_tail": traceback.format_exc().splitlines()[-3:],
    }))
"""


def main():
    results = {}
    for label, env_extra in (("plain", {}),
                             ("worker_hostnames",
                              {"TPU_WORKER_HOSTNAMES": "localhost"})):
        env = dict(os.environ)
        env.update(env_extra)
        try:
            p = subprocess.run([sys.executable, "-c", CHILD], timeout=420,
                               capture_output=True, text=True, env=env)
            line = (p.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                results[label] = json.loads(line)
            except json.JSONDecodeError:
                results[label] = {"ok": False, "rc": p.returncode,
                                  "stdout_tail": p.stdout[-300:],
                                  "stderr_tail": p.stderr[-300:]}
        except subprocess.TimeoutExpired:
            results[label] = {"ok": False, "error": "timeout (420 s): the "
                              "relay hung inside backend init or the "
                              "Mosaic compile RPC"}
        if results[label].get("ok"):
            break
    print(json.dumps({"probe": "pallas_mosaic_compile", **results},
                     default=str), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
