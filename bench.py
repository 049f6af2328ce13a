#!/usr/bin/env python
"""
End-to-end coaddition benchmark.

Coadds a standardized synthetic block region (the PR1 reference config:
simulated complex-Airy input PSFs, Gaussian target, Cholesky solve;
cf. BASELINE.json configs[0]) and reports throughput as one JSON line:

    {"metric": "blocks/hour", "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline compares the default backend (the TPU when available) against
the host CPU backend running the identical region in this same process.
On a CPU-only machine vs_baseline = 1.

The remote-TPU tunnel on this machine is intermittent, so every accelerator
phase runs under a SIGALRM watchdog; on a hang or error the benchmark falls
back to the CPU measurement and says so in the unit string.

Usage: python bench.py [--full] [--cpu-only] [--timeout SEC]
"""

import argparse
import json
import os
import pathlib
import signal
import sys
import time


class Timeout(Exception):
    pass


def _alarm(sig, frame):
    raise Timeout()


# Best-effort result, updated as phases complete; flushed by the signal
# handlers so an outer driver timeout (SIGTERM) still records a number
# instead of rc=124/parsed-null (the round-3 failure mode).
PARTIAL = {"metric": "blocks/hour", "value": None,
           "unit": "benchmark interrupted before any measurement",
           "vs_baseline": None, "partial": True}


def _flush_partial(sig, frame):
    # exit 0 after flushing: the JSON line itself says `partial`, and a
    # nonzero rc makes some drivers discard the (valid) line entirely
    try:
        print(json.dumps(PARTIAL), flush=True)
    finally:
        os._exit(0)


def _cpu_cache_path():
    return pathlib.Path(__file__).parent / ".bench_cpu_baseline.json"


def _fixture_key(cfg_dict):
    import hashlib

    keys = ("OUTSIZE", "BLOCK", "INPAD", "EXTRAINPUT", "LAKERNEL", "UCMIN")
    s = json.dumps({k: cfg_dict.get(k) for k in keys}, sort_keys=True)
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def run_region(cfg_dict, this_sub=1, stop=4, out_suffix=""):
    from pyimcom_tpu.config import Config
    from pyimcom_tpu.coadd import Block

    d = dict(cfg_dict)
    if stop:
        d["STOP"] = stop
    d["OUT"] = d["OUT"] + out_suffix
    ibx, iby = divmod(this_sub, d["BLOCK"])
    out = d["OUT"] + f"_{ibx:02d}_{iby:02d}.fits"
    if os.path.exists(out):
        os.remove(out)
    cfg = Config(d)
    t0 = time.time()
    Block(cfg=cfg, this_sub=this_sub)
    return time.time() - t0


def quality_check(path):
    """Star-recovery and leakage metrics of a bench output block."""
    import numpy as np

    from pyimcom_tpu.fitsio import fits_read
    from pyimcom_tpu.wcsutil import WCS

    f = fits_read(path)
    w = WCS.from_header(f[0].header)
    xs, ys = w.world2pix(60.0508, -3.8005)
    d = np.asarray(f[0].data[0, 0], dtype=np.float64)
    sig = 0.9265328730414752 * 0.11 / 0.04
    sc = (0.04 / 0.11) ** 2
    yy, xx = np.mgrid[0:d.shape[0], 0:d.shape[1]]
    p = np.exp(-0.5 * ((xx - float(xs)) ** 2 + (yy - float(ys)) ** 2) / sig ** 2) \
        / (2 * np.pi * sig ** 2 * sc)
    region = np.s_[0:25, 25:50]
    SL1 = float(np.sum((p * d)[region]) / np.sum((p ** 2)[region]))
    fid = np.asarray(f["FIDELITY"].data, dtype=np.float64)
    uc = 10.0 ** (fid / -5000.0)
    # exclude encodings of exactly-zero U/C (never-coadded pixels saturate)
    good = (uc > 1e-10) & (uc < 0.5)
    uc_med = float(np.median(uc[good])) if np.any(good) else 1.0
    return SL1, uc_med


def run_production_demo(timeout_s: int = 3600, stop: int = 8):
    """
    Production-geometry demonstration: coadd `stop` postage stamps of a
    REAL-size block (OUTSIZE [80, 32, 0.0390625] -> 2560^2 px, production
    INPAD 1.055") on the accelerator and report per-stamp wall time and
    peak device memory.  This answers the scale question the synthetic
    100-px bench cannot: a production stamp system here is n ~ 5-6k input
    pixels with the full 383-sample overlap windows.
    """
    import jax

    sys.path.insert(0, str(pathlib.Path(__file__).parent / "tests"))
    from survey_fixture import build_survey

    # durable by default: /tmp is wiped on reboot, which erased the
    # round-3 checkpoint at 3% of a 100-hour extrapolation
    workdir = pathlib.Path(os.environ.get(
        "PYIMCOM_PROD_DIR", str(pathlib.Path(__file__).parent / ".prod_work")))
    workdir.mkdir(exist_ok=True)
    marker = workdir / ".built"
    overrides = {"OUTSIZE": [80, 32, 0.0390625], "INPAD": 1.055,
                 "NPIXPSF": 48, "STOP": stop}
    if not marker.exists():
        cfg_dict = build_survey(workdir, n_obs=8, extrainput=["cstar14"],
                                config_overrides=overrides)
        marker.write_text("ok")
    else:
        cfg_dict = json.loads((workdir / "cfg.json").read_text())
        cfg_dict.update({k: v for k, v in overrides.items()})

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout_s)
    t0 = time.time()
    dt = run_region(cfg_dict, stop=stop, out_suffix="_prod")
    signal.alarm(0)
    stats = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:  # noqa: BLE001 - not all backends expose stats
        pass
    peak = stats.get("peak_bytes_in_use")
    print(json.dumps({
        "metric": "production_stamp_seconds",
        "value": round(dt / stop, 3),
        "unit": f"s per 32x32-px production stamp ({stop} stamps of a "
                f"2560^2 block on {jax.default_backend()}; "
                f"peak HBM {peak / 2 ** 30:.2f} GiB" if peak else
                f"s per 32x32-px production stamp ({stop} stamps of a "
                f"2560^2 block on {jax.default_backend()})",
        "vs_baseline": 1.0,
    }))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="coadd all 16 stamps")
    ap.add_argument("--cpu-only", action="store_true")
    ap.add_argument("--production", action="store_true",
                    help="production-geometry per-stamp timing demo")
    ap.add_argument("--timeout", type=int, default=2100,
                    help="accelerator watchdog seconds")
    args = ap.parse_args()

    # arm the flush-on-kill handler before anything slow (the tunnel probe
    # alone can take 180 s)
    signal.signal(signal.SIGTERM, _flush_partial)

    if args.cpu_only:
        os.environ["JAX_PLATFORMS"] = "cpu"

    # The first jax backend touch initializes the remote-TPU platform and
    # can hang indefinitely when the tunnel is down -- before any SIGALRM
    # watchdog is armed.  Probe the tunnel in a subprocess (which can be
    # killed) and fall back to the CPU platform for this whole process if
    # the probe does not come back.
    probe_note = ""
    if not args.cpu_only and os.environ.get("JAX_PLATFORMS", "") != "cpu":
        import subprocess
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, check=True, capture_output=True)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            # A half-open relay can hang `import jax` ITSELF (the plugin
            # registered at interpreter startup dials on import), even
            # under JAX_PLATFORMS=cpu -- so a plain env-var fallback would
            # hang this very process.  Re-exec with the plugin site
            # stripped from PYTHONPATH; the marker env var bounds this to
            # one re-exec.
            if os.environ.get("PYIMCOM_BENCH_REEXEC") != "1":
                env = dict(os.environ)
                env["PYIMCOM_BENCH_REEXEC"] = "1"
                env["JAX_PLATFORMS"] = "cpu"
                env["PYTHONPATH"] = os.pathsep.join(
                    p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                    if p and "axon" not in p)
                os.execve(sys.executable,
                          [sys.executable, __file__, *sys.argv[1:]], env)
            os.environ["JAX_PLATFORMS"] = "cpu"
            probe_note = "; accelerator unreachable (probe), CPU only"
    if os.environ.get("PYIMCOM_BENCH_REEXEC") == "1":
        probe_note = "; accelerator unreachable (probe), CPU only"
        args.cpu_only = True

    import jax

    if args.cpu_only or probe_note:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # keep the compile cache inside the repo so it survives across rounds
    cache_root = pathlib.Path(__file__).parent
    jax.config.update("jax_compilation_cache_dir",
                      str(cache_root / (".jax_cache" if jax.default_backend()
                                        == "cpu" else ".jax_cache_tpu")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.production:
        return run_production_demo(args.timeout)

    sys.path.insert(0, str(pathlib.Path(__file__).parent / "tests"))
    from survey_fixture import build_survey

    workdir = pathlib.Path("/tmp/pyimcom_bench")
    workdir.mkdir(exist_ok=True)
    marker = workdir / ".built"
    if not marker.exists():
        cfg_dict = build_survey(workdir, n_obs=8, extrainput=["cstar14"])
        marker.write_text("ok")
    else:
        cfg_dict = json.loads((workdir / "cfg.json").read_text())

    # the accelerator coadds the FULL 16-stamp block.  The CPU baseline is
    # too slow for a full block here, so it is measured ONCE per fixture
    # geometry and cached in-repo (.bench_cpu_baseline.json): the 16-stamp
    # block time is extrapolated SYMMETRICALLY from stop=4 and stop=8 runs
    # (marginal per-stamp cost from the difference, fixed setup charged
    # once).  The TPU phase runs FIRST and the result line prints
    # IMMEDIATELY after it using the cached baseline -- the round-3 bench
    # died in the CPU phase under the driver's outer timeout with nothing
    # recorded.  SIGTERM/SIGALRM flush a best-effort JSON before dying.
    stop_dev, nrun_dev = 0, 16
    platform = jax.default_backend()
    note = probe_note
    signal.signal(signal.SIGALRM, _alarm)
    signal.signal(signal.SIGTERM, _flush_partial)
    ibx, iby = divmod(1, cfg_dict["BLOCK"])

    fixture_key = _fixture_key(cfg_dict)
    cpu_cache = None
    if _cpu_cache_path().exists() and not args.full:
        try:
            c = json.loads(_cpu_cache_path().read_text())
            if c.get("fixture_key") == fixture_key:
                cpu_cache = c
        except (OSError, json.JSONDecodeError):
            pass
    if cpu_cache:
        PARTIAL["unit"] = ("benchmark interrupted before the accelerator "
                           "measurement; cached cpu baseline "
                           f"{3600.0 / cpu_cache['t_block_cpu']:.2f} b/h")

    def emit(dt, nrun, SL1, uc_med, t_block_cpu, cpu_note, note):
        cpu_bph = 3600.0 / t_block_cpu
        blocks_per_hour = 3600.0 / (dt * 16.0 / nrun)
        result = {
            "metric": "blocks/hour",
            "value": round(blocks_per_hour, 3),
            "unit": f"synthetic 100px blocks/hour on {platform} "
                    f"({nrun}/16 stamps, SL1={SL1:.5f}, U/C med={uc_med:.1e};"
                    f" cpu baseline {cpu_bph:.2f} b/h, {cpu_note})" + note,
            "vs_baseline": round(blocks_per_hour / cpu_bph, 3),
        }
        # attach the latest production-geometry evidence when a
        # scripts/run_production_block.py run has recorded it
        prods = sorted(pathlib.Path(__file__).parent.glob(
            "PRODUCTION_r*.json"))
        if prods:
            try:
                result["production"] = json.loads(prods[-1].read_text())
            except (OSError, json.JSONDecodeError):
                pass
        print(json.dumps(result), flush=True)

    dt = None
    if platform != "cpu":
        try:
            signal.alarm(args.timeout)
            run_region(cfg_dict, stop=stop_dev, out_suffix="_dev")  # warm compiles
            signal.alarm(args.timeout)
            dt = run_region(cfg_dict, stop=stop_dev, out_suffix="_dev")
            signal.alarm(0)
            SL1, uc_med = quality_check(
                cfg_dict["OUT"] + f"_dev_{ibx:02d}_{iby:02d}.fits")
            PARTIAL.update(
                value=round(3600.0 / dt, 3),
                unit=f"synthetic 100px blocks/hour on {platform} "
                     f"(16/16 stamps, SL1={SL1:.5f}, U/C med={uc_med:.1e}; "
                     f"killed before baseline attach)",
                vs_baseline=None)
            if cpu_cache is not None:
                emit(dt, nrun_dev, SL1, uc_med, cpu_cache["t_block_cpu"],
                     cpu_cache["cpu_note"] + " (cached)", note)
                return
        except (Timeout, Exception) as e:  # noqa: BLE001
            signal.alarm(0)
            note = f"; {platform} failed ({type(e).__name__}), CPU fallback"
            platform = "cpu-fallback"
            dt = None
        if dt is None and cpu_cache is not None:
            # accelerator unreachable but the baseline is known: report the
            # baseline itself rather than grinding a >20-minute re-measure
            # under the driver's clock
            emit(cpu_cache["t_block_cpu"], 16, cpu_cache["SL1"],
                 cpu_cache["uc_med"], cpu_cache["t_block_cpu"],
                 cpu_cache["cpu_note"] + " (cached)", note)
            return

    # CPU measurement (the baseline, and the fallback result)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if args.full:
            run_region(cfg_dict, stop=0, out_suffix="_cpu")  # warm compiles
            t_block_cpu = run_region(cfg_dict, stop=0, out_suffix="_cpu")
            cpu_note = "full block"
        else:
            run_region(cfg_dict, stop=4, out_suffix="_cpu")  # warm compiles
            dt4 = run_region(cfg_dict, stop=4, out_suffix="_cpu")
            dt8 = run_region(cfg_dict, stop=8, out_suffix="_cpu")
            marginal = max((dt8 - dt4) / 4.0, 0.0)
            fixed = max(dt4 - 4.0 * marginal, 0.0)
            t_block_cpu = fixed + 16.0 * marginal
            cpu_note = "16-stamp extrapolation from 4+8-stamp runs"
        SL1c, uc_medc = quality_check(
            cfg_dict["OUT"] + f"_cpu_{ibx:02d}_{iby:02d}.fits")
        # pin the denominator with provenance; a measured full block is
        # never overwritten by a later 4+8-stamp extrapolation
        prior = None
        if _cpu_cache_path().exists():
            try:
                prior = json.loads(_cpu_cache_path().read_text())
            except (OSError, json.JSONDecodeError):
                prior = None
        keep_prior = (not args.full and prior is not None
                      and prior.get("fixture_key") == fixture_key
                      and prior.get("cpu_note") == "full block")
        if not keep_prior:
            import datetime
            import platform as _plat

            _cpu_cache_path().write_text(json.dumps(
                {"fixture_key": fixture_key, "t_block_cpu": t_block_cpu,
                 "cpu_note": cpu_note, "SL1": SL1c, "uc_med": uc_medc,
                 "host": _plat.node(), "nproc": os.cpu_count(),
                 "date": datetime.date.today().isoformat()}))
        if dt is None:
            SL1, uc_med = SL1c, uc_medc

    if dt is None:
        dt, nrun = t_block_cpu, 16
    else:
        nrun = nrun_dev
    emit(dt, nrun, SL1, uc_med, t_block_cpu, cpu_note, note)


if __name__ == "__main__":
    main()
