#!/usr/bin/env python
"""
Example of reading a coadded mosaic and applying a metadetection shear
(counterpart of reference examples/read_and_shear_output_from_web.py,
operating on local block files; remote https/s3 sources work through the
same `^`-templated paths via compress.ReadFile).

Usage::

    python examples/read_and_shear.py <stem> <ix> <iy> [g1 g2]

Loads the 3x3 block neighborhood of block (ix, iy) from <stem>_XX_YY.fits,
masks low-fidelity and high-noise pixels, applies the shear
(deconvolve -> shear -> reconvolve with a grown Gaussian target PSF ->
resample), and writes sheared.fits alongside the input.
"""

import sys
import time

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print(__doc__)
        return 1
    stem, ix, iy = argv[0], int(argv[1]), int(argv[2])
    g1 = float(argv[3]) if len(argv) > 3 else 0.02
    g2 = float(argv[4]) if len(argv) > 4 else 0.00

    from pyimcom_tpu.meta.distortimage import MetaMosaic

    t0 = time.time()
    mm = MetaMosaic(f"{stem}_{ix:02d}_{iy:02d}.fits", verbose=True)

    # mask pixels with U/C > 1e-4 and noise above -3 dB
    mm.mask_fidelity_cut(40)
    mm.mask_noise_cut(-3)

    # reduced shear as an area-preserving Jacobian
    jac = np.array([[1.0 - g1, -g2], [-g2, 1.0 + g1]]) \
        / np.sqrt(1.0 - g1 * g1 - g2 * g2)
    N = mm.cfg.n1 * mm.cfg.n2
    out = mm.shearimage(N, jac=jac, psfgrow=1.08, oversamp=1.0)
    outfile = f"{stem}_{ix:02d}_{iy:02d}_sheared.fits"
    mm.to_file(out, outfile)
    print(f"wrote {outfile}; output PSF FWHM {out['psf_fwhm']:.3f} px; "
          f"t = {time.time() - t0:.1f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
