#!/usr/bin/env python
"""
Shape-correlation functions of star/galaxy catalogs (counterpart of
reference scripts/correlation.py, which delegates to treecorr; treecorr is
not available here, so the estimators are computed directly with
vectorized pair binning -- exact, O(N^2), fine for the catalog sizes the
validation suite produces).

Reads the *_StarCat.fits catalogs written by analysis.Mosaic.get_star_catalog
and computes, in log-spaced angular bins:

* GG : shear-shear xi_+ / xi_- of (e1, e2)
* NG : mean tangential ellipticity around catalog positions
* NK : mean sigma (size) around catalog positions

Usage::

    python scripts/correlation.py <starcat.fits> <out.txt> \
        [--min-sep 1e-4] [--max-sep 0.1] [--bins 12]
"""

import argparse

import numpy as np

DEG = np.pi / 180.0


def pair_bins(ra, dec, min_sep, max_sep, nbins):
    """Flat-sky pair separations (deg) and bin indices; i<j pairs only."""
    n = len(ra)
    i, j = np.triu_indices(n, k=1)
    cosd = np.cos(np.median(dec) * DEG)
    dx = (ra[i] - ra[j]) * cosd
    dy = dec[i] - dec[j]
    r = np.hypot(dx, dy)
    keep = (r >= min_sep) & (r < max_sep)
    i, j, dx, dy, r = i[keep], j[keep], dx[keep], dy[keep], r[keep]
    b = np.floor(np.log(r / min_sep) / np.log(max_sep / min_sep) * nbins)
    return i, j, dx, dy, r, b.astype(int)


def gg_correlation(ra, dec, e1, e2, min_sep=1e-4, max_sep=0.1, nbins=12):
    """xi_+ and xi_- from tangential/cross components along each pair."""
    i, j, dx, dy, r, b = pair_bins(ra, dec, min_sep, max_sep, nbins)
    phi = np.arctan2(dy, dx)
    c2, s2 = np.cos(2 * phi), np.sin(2 * phi)
    # rotate both shears to the pair frame
    et_i = -(e1[i] * c2 + e2[i] * s2)
    ex_i = e1[i] * s2 - e2[i] * c2
    et_j = -(e1[j] * c2 + e2[j] * s2)
    ex_j = e1[j] * s2 - e2[j] * c2
    xip = np.zeros(nbins)
    xim = np.zeros(nbins)
    cnt = np.zeros(nbins)
    np.add.at(xip, b, et_i * et_j + ex_i * ex_j)
    np.add.at(xim, b, et_i * et_j - ex_i * ex_j)
    np.add.at(cnt, b, 1.0)
    good = cnt > 0
    xip[good] /= cnt[good]
    xim[good] /= cnt[good]
    return xip, xim, cnt


def ng_correlation(ra, dec, e1, e2, min_sep=1e-4, max_sep=0.1, nbins=12):
    """Mean tangential ellipticity of object j around position i."""
    i, j, dx, dy, r, b = pair_bins(ra, dec, min_sep, max_sep, nbins)
    phi = np.arctan2(dy, dx)
    c2, s2 = np.cos(2 * phi), np.sin(2 * phi)
    et = -(e1[j] * c2 + e2[j] * s2)
    gt = np.zeros(nbins)
    cnt = np.zeros(nbins)
    np.add.at(gt, b, et)
    np.add.at(cnt, b, 1.0)
    good = cnt > 0
    gt[good] /= cnt[good]
    return gt, cnt


def nk_correlation(ra, dec, kappa, min_sep=1e-4, max_sep=0.1, nbins=12):
    """Mean scalar (e.g. size) of object j around position i."""
    i, j, dx, dy, r, b = pair_bins(ra, dec, min_sep, max_sep, nbins)
    kk = np.zeros(nbins)
    cnt = np.zeros(nbins)
    np.add.at(kk, b, kappa[j])
    np.add.at(cnt, b, 1.0)
    good = cnt > 0
    kk[good] /= cnt[good]
    return kk, cnt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("starcat")
    ap.add_argument("out")
    ap.add_argument("--min-sep", type=float, default=1e-4)
    ap.add_argument("--max-sep", type=float, default=0.1)
    ap.add_argument("--bins", type=int, default=12)
    args = ap.parse_args(argv)

    from pyimcom_tpu.fitsio import fits_read

    t = fits_read(args.starcat)["STARCAT"]
    # positions: prefer ra/dec if present, else block pixel coordinates
    names = t.names
    if "ra" in names and "dec" in names:
        ra, dec = np.asarray(t["ra"], float), np.asarray(t["dec"], float)
    else:
        # pixel coordinates scaled to degrees at 0.04''/px
        ra = np.asarray(t["x"], float) * 0.04 / 3600
        dec = np.asarray(t["y"], float) * 0.04 / 3600
    e1 = np.nan_to_num(np.asarray(t["e1"], float))
    e2 = np.nan_to_num(np.asarray(t["e2"], float))
    sig = np.nan_to_num(np.asarray(t["sigma"], float))

    xip, xim, cnt = gg_correlation(ra, dec, e1, e2, args.min_sep,
                                   args.max_sep, args.bins)
    gt, _ = ng_correlation(ra, dec, e1, e2, args.min_sep, args.max_sep,
                           args.bins)
    kk, _ = nk_correlation(ra, dec, sig - np.mean(sig), args.min_sep,
                           args.max_sep, args.bins)

    edges = np.geomspace(args.min_sep, args.max_sep, args.bins + 1)
    with open(args.out, "w") as f:
        f.write("# r_lo r_hi npairs xi_plus xi_minus gamma_t kappa\n")
        for k in range(args.bins):
            f.write(f"{edges[k]:.6e} {edges[k+1]:.6e} {int(cnt[k])} "
                    f"{xip[k]:.6e} {xim[k]:.6e} {gt[k]:.6e} {kk[k]:.6e}\n")
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
