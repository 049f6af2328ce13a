#!/usr/bin/env python
"""
Generate oversampled PSF Legendre-cube input files (counterpart of
reference scripts/genpsf_chrom.py, which builds them with roman_imsim +
GalSim; this version uses the framework's analytic complex-Airy models, so
it runs in any environment and feeds the same 'L2_fits'/'anlsim' PSF
ingest path).

For each observation, one FITS file psf_polyfit_<obsid>.fits is written
with 18 SCA HDUs of shape (ncoef, n, n).  The Legendre coefficients encode
linear spatial variation across the chip when --grad is given
(coefficients: constant, d/du, d/dv, d2/dudv), and a wavelength-like
defocus sequence when --chrom is given (one extra blur step per SED node,
mirroring the chromatic stack of the reference generator).

Usage::

    python scripts/genpsf.py OUTDIR OBSID [OBSID ...] \
        [--oversamp 8] [--npix 48] [--filter F184] [--grad G] [--chrom N]
"""

import argparse

import numpy as np


def build_cube(npix, oversamp, q_native, features=0, grad=0.0, chrom=0):
    from pyimcom_tpu.ops.psfmodels import psf_cplx_airy

    n = npix * oversamp
    base = psf_cplx_airy(n, oversamp * q_native, sigma=oversamp * 0.3,
                         features=features)
    ncoef = 4
    cube = np.zeros((ncoef, n, n), dtype=np.float32)
    cube[0] = base
    if grad:
        # linear spatial variation: slightly defocused PSF toward the chip
        # edges (coefficient of P_1(u) and P_1(v))
        from scipy.ndimage import gaussian_filter

        soft = gaussian_filter(base, oversamp * 0.15)
        cube[1] = grad * (soft - base)
        cube[2] = grad * (soft - base)
    if chrom:
        from scipy.ndimage import gaussian_filter

        acc = np.zeros_like(base)
        for j in range(chrom):
            acc += gaussian_filter(base, oversamp * 0.05 * (j + 1)) / chrom
        cube[0] = 0.5 * base + 0.5 * acc
    return cube


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("obsids", nargs="+", type=int)
    ap.add_argument("--oversamp", type=int, default=8)
    ap.add_argument("--npix", type=int, default=48)
    ap.add_argument("--filter", default="F184")
    ap.add_argument("--grad", type=float, default=0.0)
    ap.add_argument("--chrom", type=int, default=0)
    args = ap.parse_args(argv)

    from pyimcom_tpu.config import Settings as Stn
    from pyimcom_tpu.fitsio import HDUList, Header, ImageHDU, fits_write

    filt = list(Stn.RomanFilters).index(args.filter)
    q = Stn.QFilterNative[filt]
    import os

    os.makedirs(args.outdir, exist_ok=True)
    for obsid in args.obsids:
        hdr = Header()
        hdr["CFORMAT"] = "Legendre basis"
        hdr["PORDER"] = 1
        hdr["NCOEF"] = 4
        hdr["OVSAMP"] = args.oversamp
        hdr["NSCA"] = 18
        hdus = [ImageHDU(np.zeros((1,), np.float32), header=hdr)]
        for sca in range(1, 19):
            cube = build_cube(args.npix, args.oversamp, q,
                              features=(obsid + sca) % 8, grad=args.grad,
                              chrom=args.chrom)
            h = ImageHDU(cube)
            h.header["SCA"] = sca
            hdus.append(h)
        out = f"{args.outdir}/psf_polyfit_{obsid:d}.fits"
        fits_write(out, HDUList(hdus))
        print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
