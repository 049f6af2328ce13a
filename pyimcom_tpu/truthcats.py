"""
Truth catalogs for injected sources.

Counterpart of reference src/pyimcom/truthcats.py: regenerates the exact
positions (and, for noisy grids, expected amplitudes) of the simulated
sources that the layer subsystem injected, per mosaic block, and writes
them to a FITS table file.  Because injection grids are deterministic
HEALPix grids (layer.py star grids), the catalog is reproducible from the
configuration alone.
"""

from __future__ import annotations

import re
from os.path import exists

import numpy as np

from .config import Config, Settings as Stn
from .fitsio import HDUList, ImageHDU, TableHDU, fits_write
from .sphere import healpix_patch
from .wcsutil import WCS, make_block_wcs

DEG = np.pi / 180.0


def block_truth_positions(cfg, ibx: int, iby: int, res: int):
    """
    Injected-grid sources falling on block (ibx, iby): returns dict of
    columns (ipix, ra, dec, x, y) with x, y in block pixel coordinates.
    """
    wcs = make_block_wcs(cfg, ibx, iby)
    ctr = (cfg.NsideP - 1) / 2.0
    ra0, dec0 = wcs.pix2world(np.array([ctr]), np.array([ctr]))
    radius = cfg.NsideP * cfg.dtheta * DEG  # generous block circumradius
    patch = healpix_patch(res, float(ra0[0]) * DEG, float(dec0[0]) * DEG, radius)
    if patch["npix"] == 0:
        return {k: np.zeros(0) for k in ("ipix", "ra", "dec", "x", "y")}
    ra = patch["rapix"] / DEG
    dec = patch["decpix"] / DEG
    x, y = wcs.world2pix(ra, dec)
    keep = (x > -0.5) & (x < cfg.NsideP - 0.5) & (y > -0.5) & (y < cfg.NsideP - 0.5)
    return {
        "ipix": patch["ipix"][keep],
        "ra": ra[keep],
        "dec": dec[keep],
        "x": x[keep],
        "y": y[keep],
    }


def gen_truthcats_from_cfg(cfg: Config, outfile: str = None) -> str:
    """
    Generate truth catalogs for every injection layer of a configured run,
    covering all blocks of the mosaic; writes <outstem>_TruthCat.fits.

    Table HDUs are named TRUTH<res>; columns include the block indices so a
    consumer can find each source in its block file.
    """
    cfg()
    resolutions = set()
    for spec in cfg.extrainput[1:]:
        if spec is None:
            continue
        m = re.search(r"^(cstar|gsstar|gstrstar|nstar)(\d+)", spec, re.IGNORECASE)
        if m:
            resolutions.add(int(m.group(2)))

    hdus = HDUList([ImageHDU(None)])
    for res in sorted(resolutions):
        cols = {k: [] for k in ("ipix", "ra", "dec", "x", "y", "ibx", "iby")}
        for ibx in range(cfg.nblock):
            for iby in range(cfg.nblock):
                # only include blocks whose output file exists (partial runs)
                fname = cfg.outstem + f"_{ibx:02d}_{iby:02d}.fits"
                if not exists(fname):
                    continue
                pos = block_truth_positions(cfg, ibx, iby, res)
                npos = len(pos["ipix"])
                for k in ("ipix", "ra", "dec", "x", "y"):
                    cols[k].append(pos[k])
                cols["ibx"].append(np.full(npos, ibx, dtype=np.int32))
                cols["iby"].append(np.full(npos, iby, dtype=np.int32))
        data = {
            "ipix": np.concatenate(cols["ipix"]).astype(np.int64) if cols["ipix"] else np.zeros(0, np.int64),
            "ra": np.concatenate(cols["ra"]) if cols["ra"] else np.zeros(0),
            "dec": np.concatenate(cols["dec"]) if cols["dec"] else np.zeros(0),
            "x": np.concatenate(cols["x"]) if cols["x"] else np.zeros(0),
            "y": np.concatenate(cols["y"]) if cols["y"] else np.zeros(0),
            "ibx": np.concatenate(cols["ibx"]).astype(np.int32) if cols["ibx"] else np.zeros(0, np.int32),
            "iby": np.concatenate(cols["iby"]).astype(np.int32) if cols["iby"] else np.zeros(0, np.int32),
        }
        t = TableHDU(data=data, name=f"TRUTH{res:d}")
        t.header["RESOLUTI"] = res
        t.header["FILTER"] = Stn.RomanFilters[cfg.use_filter]
        hdus.append(t)

    out = outfile or (cfg.outstem + "_TruthCat.fits")
    fits_write(out, hdus)
    print(f"truth catalog written to {out}")
    return out


def gen_truthcats(pars):
    """List-argument entry point (reference truthcats.py:29 signature)."""
    name, filt, in_prefix, outstem = pars
    cfg = Config(in_prefix + "_00_00.fits", inmode="block")
    if isinstance(filt, int):
        cfg.use_filter = filt
    return gen_truthcats_from_cfg(cfg, outfile=(outstem or None))
