#!/usr/bin/env python
"""
End-to-end coaddition benchmark.

Coadds one standardized synthetic block (the PR1 reference config: single
output block, simulated complex-Airy input PSFs, Gaussian target, Cholesky
solve; cf. BASELINE.json configs[0]) and reports throughput as one JSON
line:

    {"metric": "blocks/hour", "value": ..., "unit": "blocks/hour",
     "vs_baseline": ...}

vs_baseline is the speedup of the default JAX backend (the TPU when
available) over the CPU backend running the identical block in this same
process -- i.e. the measured TPU-vs-host advantage on this hardware.  On a
CPU-only machine vs_baseline = 1.

Usage: python bench.py [--quick] [--cpu-only]
"""

import argparse
import json
import os
import pathlib
import sys
import time


def run_block(cfg_dict, this_sub=1):
    from pyimcom_tpu.config import Config
    from pyimcom_tpu.coadd import Block

    cfg = Config(dict(cfg_dict))
    t0 = time.time()
    Block(cfg=cfg, this_sub=this_sub)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="coadd 4 stamps only")
    ap.add_argument("--cpu-only", action="store_true")
    args = ap.parse_args()

    if args.cpu_only:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu_only:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, str(pathlib.Path(__file__).parent / "tests"))
    from survey_fixture import build_survey

    workdir = pathlib.Path("/tmp/pyimcom_bench")
    workdir.mkdir(exist_ok=True)
    marker = workdir / ".built"
    overrides = {"STOP": 4} if args.quick else {}
    if not marker.exists():
        cfg_dict = build_survey(workdir, n_obs=8, extrainput=["cstar14"],
                                config_overrides=overrides)
        marker.write_text("ok")
    else:
        import json as _json
        cfg_dict = _json.loads((workdir / "cfg.json").read_text())
        cfg_dict.update(overrides)

    platform = jax.devices()[0].platform
    nrun = 4 if args.quick else 16

    # run 1 warms compiles and the input-layer cache; run 2 is the measurement
    run_block(cfg_dict)
    dt = run_block(cfg_dict)
    blocks_per_hour = 3600.0 / dt * (4.0 / nrun if args.quick else 1.0)

    vs_baseline = 1.0
    if platform != "cpu":
        # baseline: identical block on the host CPU backend
        cpu = jax.local_devices(backend="cpu")
        with jax.default_device(cpu[0]):
            run_block(cfg_dict)
            dt_cpu = run_block(cfg_dict)
        vs_baseline = dt_cpu / dt

    print(json.dumps({
        "metric": "blocks/hour",
        "value": round(blocks_per_hour, 3),
        "unit": f"synthetic 100px blocks/hour on {platform} "
                f"({'quick' if args.quick else 'full'})",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
