"""
Parallel pre-generation of input layer caches.

Counterpart of reference src/pyimcom/layer_wrapper.py: building the
(n_inframe, 4088, 4088) layer cubes is embarrassingly parallel over
exposures; this wrapper fans the work over a process pool (forkserver, as
in the reference, for interpreter safety) and the file-locked INLAYERCACHE
makes concurrent workers idempotent.
"""

from __future__ import annotations

import concurrent.futures
import multiprocessing
import os

from .config import Config


def build_one_layer(cfg_dict: dict, idsca) -> tuple:
    """Build (or load) the layer cube for one (obsid, sca); returns status."""
    try:
        from .coadd import Block

        cfg = Config(dict(cfg_dict))
        # a throwaway block context supplies obs table + WCS machinery;
        # stoptile=1 keeps the geometry setup minimal
        blk = Block(cfg=cfg, this_sub=0, run_coadd=False)
        blk.parse_config()
        from .coadd import InImage
        from .layer import get_all_data

        blk.pmask = None
        blk.use_instamps = None
        im = InImage(blk, tuple(idsca))
        if not im.exists_:
            return (idsca, "missing")
        get_all_data(im)
        return (idsca, "ok")
    except Exception as e:  # noqa: BLE001 -- worker failures are collected
        return (idsca, f"error: {e}")


def build_all_layers(cfg, idscas=None, nworkers: int = None) -> list:
    """
    Build layer caches for all (or the given) exposures in parallel.

    Worker count follows SLURM_CPUS_PER_TASK / OMP_NUM_THREADS when set
    (reference imdestripe.py:2356-2361 convention).  Failures are collected
    and re-raised at the end (reference layer_wrapper.py:86-96).
    """
    if isinstance(cfg, Config):
        cfg_dict = cfg.to_dict()
    else:
        cfg_dict = dict(cfg)

    if idscas is None:
        from .coadd import Block

        blk = Block(cfg=Config(dict(cfg_dict)), this_sub=0, run_coadd=False)
        blk.parse_config()
        search_radius = 1.0
        blk._get_obs_cover(search_radius)
        idscas = blk.obslist

    if nworkers is None:
        nworkers = int(os.environ.get("SLURM_CPUS_PER_TASK",
                                      os.environ.get("OMP_NUM_THREADS", "2")))

    results = []
    failures = []
    if nworkers <= 1 or (os.cpu_count() or 1) == 1:
        # single worker (or single-core host): the pool buys nothing and
        # forkserver startup can wedge under load -- run in-process
        for idsca in idscas:
            res = build_one_layer(cfg_dict, idsca)
            results.append(res)
            if str(res[1]).startswith("error"):
                failures.append(res)
        if failures:
            raise RuntimeError(
                f"{len(failures)} layer builds failed: {failures[:3]}")
        return results
    ctx = multiprocessing.get_context("forkserver")
    with concurrent.futures.ProcessPoolExecutor(max_workers=nworkers,
                                                mp_context=ctx) as pool:
        futs = {pool.submit(build_one_layer, cfg_dict, idsca): idsca
                for idsca in idscas}
        for fut in concurrent.futures.as_completed(futs):
            res = fut.result()
            results.append(res)
            if str(res[1]).startswith("error"):
                failures.append(res)
    if failures:
        raise RuntimeError(f"{len(failures)} layer builds failed: {failures[:3]}")
    return results


def compress_all_blocks(cfg, scheme="I24B", pars=None, layers=None,
                        nworkers: int = None) -> list:
    """
    Compress every existing block file of a run in parallel
    (counterpart of reference compress/compressutils_wrapper.py).
    """
    from .compress import CompressedOutput

    if isinstance(cfg, dict):
        cfg = Config(dict(cfg))
    pars = pars or {"VMIN": "-100.0", "VMAX": "100.0", "DIFF": "True",
                    "SOFTBIAS": "-1"}
    done = []
    for ibx in range(cfg.nblock):
        for iby in range(cfg.nblock):
            fname = cfg.outstem + f"_{ibx:02d}_{iby:02d}.fits"
            if not os.path.exists(fname):
                continue
            co = CompressedOutput(fname)
            nlayer = co.hdul[0].data.shape[-3]
            for il in (layers if layers is not None else range(1, nlayer)):
                co.compress_layer(il, scheme, pars)
            out = fname[:-5] + ".cpr.fits.gz"
            co.to_file(out)
            done.append(out)
    return done
