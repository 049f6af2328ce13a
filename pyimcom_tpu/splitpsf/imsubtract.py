"""
Wing subtraction: remove K (*) (coadded mosaic) from cached input exposures.

Counterpart of reference src/pyimcom/splitpsf/imsubtract.py.  The heavy
kernel is :func:`fftconvolve_multi` -- a valid-mode FFT convolution of one
large canvas with a stack of kernels sharing one forward transform -- which
on accelerators runs as batched jnp.fft; the per-exposure resampling back
to the SCA frame reuses the framework's interpolation ops.
"""

from __future__ import annotations

import numpy as np


def fftconvolve_multi(canvas: np.ndarray, kernels: np.ndarray,
                      use_jax: bool = None) -> np.ndarray:
    """
    Valid-mode convolution of `canvas` (ny, nx) with a stack of `kernels`
    (nk, my, mx): returns (nk, ny-my+1, nx-mx+1).  The canvas is transformed
    once and multiplied against every kernel spectrum (reference
    imsubtract.py:48-130).
    """
    ny, nx = canvas.shape
    nk, my, mx = kernels.shape
    oy, ox = ny - my + 1, nx - mx + 1
    if oy <= 0 or ox <= 0:
        raise ValueError("kernel larger than canvas")

    if use_jax is None:
        import jax

        use_jax = jax.default_backend() != "cpu"

    if use_jax:
        import jax.numpy as jnp

        cf = jnp.fft.rfft2(jnp.asarray(canvas), s=(ny, nx))
        kf = jnp.fft.rfft2(jnp.asarray(kernels), s=(ny, nx))
        full = jnp.fft.irfft2(cf[None] * kf, s=(ny, nx))
        out = np.asarray(full[:, my - 1:my - 1 + oy, mx - 1:mx - 1 + ox])
    else:
        cf = np.fft.rfft2(canvas, s=(ny, nx))
        kf = np.fft.rfft2(kernels, s=(ny, nx))
        full = np.fft.irfft2(cf[None] * kf, s=(ny, nx))
        out = full[:, my - 1:my - 1 + oy, mx - 1:mx - 1 + ox]
    return out


def tukey_window_1d(n: int, width: int) -> np.ndarray:
    """Flat-top window with cosine tapers of `width` samples on each side."""
    w = np.ones(n)
    if width > 0:
        t = 0.5 * (1 - np.cos(np.pi * np.arange(1, width + 1) / (width + 1)))
        w[:width] = t
        w[-width:] = t[::-1]
    return w


def tukey_window_2d(n: int, width: int) -> np.ndarray:
    w = tukey_window_1d(n, width)
    return np.outer(w, w)


def subtract_wings_from_exposure(exposure_image, exposure_wcs, mosaic_image,
                                 mosaic_wcs, K_cube, oversamp,
                                 eval_legendre_at=None):
    """
    Subtract the long-range PSF contribution from one exposure.

    The (Gamma-smoothed) coadded mosaic is convolved with the exposure's
    wing kernel K (evaluated at the exposure center unless
    `eval_legendre_at` provides per-position Legendre weights) and the
    result is resampled onto the exposure grid and subtracted.

    Returns the corrected exposure image.  This is the single-canvas core
    of the reference's per-block stitched pipeline (imsubtract.py:265-725);
    the blockwise Tukey-stitched driver composes it over mosaic blocks.
    """
    import jax.numpy as jnp

    from ..ops.interp import interp2d, interp2d_dense
    from ..psfgrp import _use_dense

    # kernel at the exposure center (constant Legendre term if no evaluator)
    if eval_legendre_at is None:
        K = K_cube[0]
    else:
        K = np.einsum("a,aij->ij", eval_legendre_at, K_cube)

    conv = fftconvolve_multi(mosaic_image, K[None])[0]
    # mosaic pixel coordinates of the valid-convolution origin
    my, mx = K.shape
    off_y, off_x = (my - 1) / 2.0, (mx - 1) / 2.0

    ny, nx = exposure_image.shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    ra, dec = exposure_wcs.pix2world(xx.ravel().astype(float), yy.ravel().astype(float))
    gx, gy = mosaic_wcs.world2pix(ra, dec)
    # positions within the valid-convolution frame
    qx = gx - off_x + 6
    qy = gy - off_y + 6
    pad = np.pad(conv, 6)
    if _use_dense():
        vals = np.asarray(interp2d_dense(jnp.asarray(pad)[None],
                                         jnp.asarray(qx)[None],
                                         jnp.asarray(qy)[None]))[0]
    else:
        vals = np.asarray(interp2d(jnp.asarray(pad), jnp.asarray(qx),
                                   jnp.asarray(qy)))
    return exposure_image - vals.reshape(ny, nx)
