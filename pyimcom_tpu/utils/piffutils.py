"""
Piff PSF model ingestion (gated).

Counterpart of reference src/pyimcom/utils/piffutils.py (PiffPSFModel:
oversampled drawing of Piff PSF solutions and conversion to Legendre
cubes).  The `piff` package -- and its GalSim dependency -- are not
available in this environment, so this module provides the API surface
with an informative error, plus the Legendre-cube conversion for PSF
stamps produced elsewhere.
"""

from __future__ import annotations

import numpy as np
from scipy.special import roots_legendre


class PiffPSFModel:
    """Placeholder for Piff PSF solutions; raises on construction."""

    def __init__(self, fname, sca):
        raise ImportError(
            "Piff PSF input requires the 'piff' package (and GalSim), which "
            "are not available in this environment.  Convert the Piff "
            "solution to a Legendre cube offline (see psf_stamps_to_legendre_"
            "cube) and use the 'L2_fits' PSF format instead.")


def psf_stamps_to_legendre_cube(draw_fn, lorder: int, nside: int = 4088):
    """
    Convert a per-position PSF drawing function into a Legendre coefficient
    cube by Gauss-Legendre quadrature over the chip (the conversion the
    reference performs for Piff models, piffutils.py:98-213).

    draw_fn : callable (x, y) -> 2D PSF stamp at chip position (x, y).
    lorder : Legendre order per axis; the cube has (lorder+1)^2 planes.
    """
    from scipy.special import eval_legendre

    xL, wL = roots_legendre(lorder + 1)
    xg, yg = (a.ravel() for a in np.meshgrid(xL, xL))
    wg = np.outer(wL, wL).ravel()
    npoly = (lorder + 1) ** 2
    lrange = np.arange(lorder + 1)

    cube = None
    for i in range(npoly):
        x = nside / 2.0 * (1 + xg[i])
        y = nside / 2.0 * (1 + yg[i])
        stamp = np.asarray(draw_fn(x, y), dtype=np.float64)
        if cube is None:
            cube = np.zeros((npoly,) + stamp.shape)
        lpw = np.outer(eval_legendre(lrange, yg[i]),
                       eval_legendre(lrange, xg[i])).ravel()
        cube += wg[i] * np.tensordot(lpw, stamp, axes=0)
    lnorm = np.outer(lrange + 0.5, lrange + 0.5).ravel()
    return cube * lnorm[:, None, None]
