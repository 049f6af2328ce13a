#!/usr/bin/env python
"""
Full production-geometry block coadd with crash/hang resilience.

Coadds ONE production-size block -- OUTSIZE [80, 32, 0.0390625] (2560^2
output px, 6400 postage stamps), INPAD 1.055", NPIXPSF 48, the geometry of
the reference's default_config.json / writejob production envelope
(reference configs/default_config.json, scripts/writejob_example.pl:88-95)
-- on the default accelerator, end to end.

The remote-TPU tunnel on this machine can hang for tens of minutes, so the
block runs in a child process with PYIMCOM_CHECKPOINT=1 (Block snapshots
the accumulated maps + drained-group count); a watchdog restarts the child
whenever its log stops advancing, and the rerun resumes after the saved
scan-order prefix.  Progress is durable across any number of restarts.

Writes <repo>/PRODUCTION_r04.json with wall time, s/stamp, and
blocks/hour/chip when the block completes.

Usage: python scripts/run_production_block.py [--stall-sec 1200]
       [--max-hours 11] [--ckpt-sec 300]
"""

import argparse
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
# durable by default (/tmp is wiped on reboot -- it erased the round-3
# checkpoint); override with PYIMCOM_PROD_DIR
WORK = pathlib.Path(os.environ.get("PYIMCOM_PROD_DIR",
                                   str(REPO / ".prod_work")))
LOG = WORK / "production_block.log"
ARTIFACT = REPO / "PRODUCTION_r05.json"
CHILD = r"""
import json, os, pathlib, sys, time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", sys.argv[2])
# persist EVERY executable: the relay's compile service can degrade to
# minutes per program mid-run, and any compile not in the cache then
# becomes a watchdog-visible stall; a compile that finished once must
# never be repeated
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, sys.argv[3])
from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block
cfg_dict = json.loads(pathlib.Path(sys.argv[1]).read_text())
cfg_dict["STOP"] = 0
cfg_dict["OUT"] = cfg_dict["OUT"] + "_full"
print("backend:", jax.default_backend(), flush=True)
t0 = time.time()
Block(cfg=Config(cfg_dict), this_sub=1)
print(f"CHILD_DONE wall={time.time() - t0:.1f}", flush=True)
"""


def tunnel_up(timeout=75):
    """
    True when the accelerator backend initializes in a throwaway
    subprocess.  The remote-TPU link hangs *inside* backend init (signals
    cannot interrupt it), so the probe must be a separate process with a
    hard timeout -- same pattern as bench.py's pre-flight probe.
    """
    try:
        rc = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() != 'cpu'"],
            timeout=timeout, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        return rc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel(t_start, max_hours, probe_sec=120):
    """Block until the tunnel answers (or the max-hours budget expires)."""
    while (time.time() - t_start) / 3600.0 <= max_hours:
        if tunnel_up():
            return True
        print(f"[watchdog] tunnel down; next probe in {probe_sec}s",
              flush=True)
        time.sleep(probe_sec)
    return False


def launch(env):
    f = open(LOG, "ab")
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD, str(WORK / "cfg.json"),
         str(REPO / ".jax_cache_tpu"), str(REPO)],
        stdout=f, stderr=subprocess.STDOUT, env=env,
        start_new_session=True)
    return p, f


def _quality_medians():
    """
    Median leakage U/C and noise Sigma over every per-stamp quality print
    in the child log ("sqUC,sqSig medians | <sqrt(U/C)> <sqrt(Sigma)>",
    the same accounting line the reference block log carries).  Returns
    {} when the log has none yet.
    """
    import re

    import numpy as np

    vals = [(float(m.group(1)), float(m.group(2))) for m in re.finditer(
        r"sqUC,sqSig medians \| ([0-9.E+-]+) ([0-9.E+-]+)",
        LOG.read_text(errors="replace"))]
    if not vals:
        return {}
    squc = np.median([v[0] for v in vals])
    sqsig = np.median([v[1] for v in vals])
    return {"UC_median": float(f"{squc ** 2:.3g}"),
            "Sigma_median": float(f"{sqsig ** 2:.3g}")}


def write_partial(ckpt, n_restarts):
    """
    Record partial progress when the run is paused by max-hours: groups
    drained so far (from the resumable checkpoint) plus a warm s/stamp
    measured from the child log's recent "postage stamp" timestamps, so
    an interrupted production block still yields a durable, honest
    extrapolation in the round artifact.
    """
    import re

    if not ckpt.exists():
        return
    import numpy as np

    z = np.load(ckpt)
    done, total = int(z["groups_done"]), int(z["n_groups"])
    stamps_per_group = int(z["nrun"]) // max(total, 1)

    # warm rate: median wall-clock gap between consecutive stamp-group
    # prints over the final restart segment (child-relative clocks reset
    # at each restart, so only use monotone tail times)
    times = [float(m.group(1)) for m in re.finditer(
        r"postage stamp\s+\d+,\s*\d+\s+t=\s*([0-9.]+) s",
        LOG.read_text(errors="replace"))]
    tail, prev = [], None
    for t in times:
        if prev is not None and t < prev:
            tail = []
        if prev is None or t > prev:
            tail.append(t)
        prev = t
    gaps = sorted(b - a for a, b in zip(tail, tail[1:]) if b > a)
    s_per_group = gaps[len(gaps) // 2] if gaps else float("nan")
    s_per_stamp = s_per_group / max(stamps_per_group, 1)
    result = {
        "metric": "production_block_progress",
        "partial": True,
        "groups_done": done,
        "n_groups": total,
        "pct_done": round(100.0 * done / max(total, 1), 2),
        "warm_s_per_stamp": round(s_per_stamp, 2),
        "extrapolated_block_hours": round(
            s_per_group * total / 3600.0, 2) if gaps else None,
        "restarts": n_restarts,
        "checkpoint": str(ckpt),
        "unit": ("2560^2-px production block (6400 stamps) on one chip; "
                 "resumable from checkpoint"),
        "note": ("median stamp-gap over the log tail of the final restart "
                 "segment (r4 defaults: gather-free v2 sweep kernels + "
                 "block-compaction dus A assembly, MICROBENCH_r04.json)"),
    }
    result.update(_quality_medians())
    ARTIFACT.write_text(json.dumps(result) + "\n")
    print(json.dumps(result), flush=True)


def _segment_walls():
    """
    Per-child-segment on-chip wall seconds, from the appended log.

    Each child prints ``backend: <name>`` once at startup and timestamps
    every stamp group with its OWN clock (``postage stamp r,c  t= <s> s``),
    then ``CHILD_DONE wall=<s>`` on a clean finish.  The log is opened in
    append mode across every restart and every watchdog invocation, so
    summing each segment's final timestamp gives the TRUE total on-chip
    wall for the block, including segments whose watchdog died.

    A log with no ``backend:`` markers (lost/truncated by an outage, or a
    hand-assembled finalize-only log) is treated as ONE segment so the
    writer still produces an artifact instead of dividing by zero; in
    that degenerate case a trailing ``CHILD_DONE wall=`` (the child's own
    authoritative total) wins over intermediate stamp timestamps.
    """
    import re

    text = LOG.read_text(errors="replace")
    parts = text.split("backend: ")
    segments = parts[1:] if len(parts) > 1 else [text]
    walls = []
    for seg in segments:
        done = re.findall(r"CHILD_DONE wall=([0-9.]+)", seg)
        if done:
            walls.append(float(done[-1]))
            continue
        ts = re.findall(r"t=\s*([0-9.]+) s", seg)
        walls.append(float(ts[-1]) if ts else 0.0)
    return walls


def _outage_wall():
    """
    Total wall including tunnel hangs: every segment opens with a
    timestamped jax WARNING banner, and the final segment closes with
    CHILD_DONE, so (last CHILD_DONE time ~ file mtime) - first banner
    time spans launches, hangs, watchdog kills, and resume replays.
    Returns seconds, or None when no banner is parseable.
    """
    import datetime
    import re

    text = LOG.read_text(errors="replace")
    stamps = re.findall(
        r"WARNING:(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})", text)
    if not stamps:
        return None
    t0 = datetime.datetime.strptime(stamps[0], "%Y-%m-%d %H:%M:%S")
    t1 = datetime.datetime.fromtimestamp(LOG.stat().st_mtime)
    return max(0.0, (t1 - t0).total_seconds())


def write_complete(out_fits, ckpt, n_restarts, prior_wall=0.0):
    """
    Record a COMPLETED block with the true accumulated on-chip wall.

    Total wall = sum of every log segment's final timestamp (see
    _segment_walls) + ``prior_wall`` for any invocations whose log was
    lost.  Used by the normal watchdog exit and by --finalize-only (a run
    whose watchdog died but whose detached child finished).
    """
    walls = _segment_walls()
    wall = sum(walls) + prior_wall
    n_stamps = 80 * 80
    result = {
        "metric": "production_block_wall_hours",
        "value": round(wall / 3600.0, 3),
        "unit": (f"hours for one 2560^2-px block (6400 stamps, INPAD "
                 f"1.055\") on one chip; {wall / n_stamps:.2f} s/stamp; "
                 f"{len(walls)} child segments (tunnel restarts)"),
        "blocks_per_hour_per_chip": (round(3600.0 / wall, 4)
                                     if wall > 0 else None),
        "s_per_stamp": round(wall / n_stamps, 3),
        "restarts": n_restarts,
        "segment_walls_s": [round(w, 1) for w in walls],
        "output": str(out_fits),
        "checkpoint_left": ckpt.exists(),
    }
    outage = _outage_wall()
    if outage is not None:
        # launch-to-finish span including tunnel hangs, watchdog kills,
        # and checkpoint-resume replays (the environment's cost, not the
        # framework's; the headline value is productive on-chip wall)
        result["wall_including_outages_hours"] = round(outage / 3600.0, 3)
    result.update(_quality_medians())
    ARTIFACT.write_text(json.dumps(result) + "\n")
    print(json.dumps(result), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall-sec", type=int, default=1200,
                    help="restart the child if the log is static this long")
    ap.add_argument("--max-hours", type=float, default=11.0)
    ap.add_argument("--ckpt-sec", type=int, default=300)
    ap.add_argument("--prior-wall-sec", type=float, default=0.0,
                    help="on-chip wall seconds already spent on this block "
                         "by earlier watchdog invocations (checkpoint "
                         "resumes); added to the completion artifact so "
                         "multi-invocation runs report the TRUE total")
    ap.add_argument("--finalize-only", action="store_true",
                    help="write the round artifact from the existing log + "
                         "checkpoint without launching a child (use after "
                         "a detached child outlived its watchdog)")
    args = ap.parse_args()

    assert (WORK / "cfg.json").exists(), \
        "run 'python bench.py --production' once first to build the survey"

    if args.finalize_only:
        out_fits = WORK / "out" / "testout_F_full_00_01.fits"
        ckpt = WORK / "out" / "testout_F_full_00_01.ckpt.npz"
        if out_fits.exists() and "CHILD_DONE" in LOG.read_text(
                errors="replace"):
            write_complete(out_fits, ckpt, n_restarts=0,
                           prior_wall=args.prior_wall_sec)
        else:
            write_partial(ckpt, n_restarts=0)
        return 0

    env = dict(os.environ)
    env.update({
        "PYIMCOM_CHECKPOINT": "1",
        "PYIMCOM_CKPT_SEC": str(args.ckpt_sec),
    })

    out_fits = WORK / "out" / "testout_F_full_00_01.fits"
    ckpt = WORK / "out" / "testout_F_full_00_01.ckpt.npz"
    t_start = time.time()
    n_restarts = 0

    while True:
        # profiling brackets every phase in block_until_ready for honest
        # attribution, which serializes the async pipeline -- request it
        # explicitly (PYIMCOM_PROD_PROFILE=1) for a diagnostic segment;
        # the default long-haul run keeps the pipeline asynchronous
        env["PYIMCOM_PROFILE"] = (
            "1" if (n_restarts == 0
                    and os.environ.get("PYIMCOM_PROD_PROFILE") == "1")
            else "0")
        # don't burn a stall cycle on a child that will only hang in
        # backend init: launch when the tunnel actually answers
        if not wait_for_tunnel(t_start, args.max_hours):
            print("[watchdog] max-hours reached while tunnel down",
                  flush=True)
            write_partial(ckpt, n_restarts)
            return 2
        p, f = launch(env)
        try:
            while True:
                time.sleep(60)
                rc = p.poll()
                if rc is not None:
                    break
                age = time.time() - LOG.stat().st_mtime
                run_h = (time.time() - t_start) / 3600.0
                if age > args.stall_sec:
                    print(f"[watchdog] log static {age:.0f}s "
                          f"-> restart (#{n_restarts + 1})", flush=True)
                    os.killpg(p.pid, signal.SIGKILL)
                    p.wait()
                    n_restarts += 1
                    rc = None
                    break
                if run_h > args.max_hours:
                    print("[watchdog] max-hours reached; leaving checkpoint "
                          "for a later resume", flush=True)
                    os.killpg(p.pid, signal.SIGKILL)
                    p.wait()
                    write_partial(ckpt, n_restarts)
                    return 2
        finally:
            f.close()
        if rc == 0 and out_fits.exists():
            break
        if rc is not None and rc != 0:
            n_restarts += 1
            print(f"[watchdog] child exited rc={rc} "
                  f"-> restart (#{n_restarts})", flush=True)
        time.sleep(10)

    write_complete(out_fits, ckpt, n_restarts,
                   prior_wall=args.prior_wall_sec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
