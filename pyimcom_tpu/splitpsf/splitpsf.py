"""
PSF short/long-range decomposition: G = G^S + K (*) Gamma + zeta.

Counterpart of reference src/pyimcom/splitpsf/splitpsf.py: the PSF is split
with an integrated-Blackman radial window into a compact core G^S (used for
coaddition) and wings; the wings are deconvolved by a WCS-dependent
Gaussian Gamma at the Gauss-Legendre nodes of the Legendre-cube domain,
yielding a kernel K (so the wings can be subtracted from the input images
as K convolved with a Gamma-smoothed coadd) and a small residual zeta.
"""

from __future__ import annotations

import numpy as np
import scipy.signal
from scipy.special import eval_legendre, roots_legendre

from ..config import Settings as Stn
from ..fitsio import HDUList, Header, ImageHDU, fits_read, fits_write
from ..wcsutil import local_partial_pixel_derivatives2


class SplitPSF:
    """
    Decompose one SCA's PSF Legendre cube.

    Parameters
    ----------
    psfcube : (npoly, n, n) Legendre-coefficient PSF cube (oversampled).
    wcs_ : the SCA WCS (for the local distortion of Gamma), or None.
    pars : dict of options (r_in, r_out, sigmaGamma, eps, oversamp, ...).
    """

    @staticmethod
    def window_integrated_blackman(x):
        """C2-smooth step: 0 for x<=-1, 1 for x>=1 (integrated Blackman)."""
        alpha = 0.08
        core = (0.5 * (x + 1)
                + (0.5 * np.sin(np.pi * x) + alpha / 4 * np.sin(2 * np.pi * x))
                / ((1 - alpha) * np.pi))
        return np.where(x >= 1, 1.0, np.where(x <= -1, 0.0, core))

    @staticmethod
    def window_2d(n, r1, r2):
        """Radial window: 1 inside r1, 0 outside r2, smooth between."""
        ax = np.linspace((1 - n) / 2.0, (n - 1) / 2.0, n)
        xx, yy = np.meshgrid(ax, ax)
        r = np.hypot(xx, yy)
        return SplitPSF.window_integrated_blackman(-1.0 + 2.0 / (r2 - r1) * (r2 - r))

    @staticmethod
    def truncate_2d(n, m):
        """Separable edge taper over m pixels on each side."""
        if m == 0:
            return np.ones((n, n))
        X = np.ones(n)
        X[:m] = SplitPSF.window_integrated_blackman(np.linspace(-1.0, 1.0, m + 2))[1:-1]
        X[-m:] = X[m - 1::-1]
        return np.outer(X, X)

    @staticmethod
    def tophatfilter(cube, tophatwidth):
        """Tophat-smooth each plane of a 3D cube (Fourier-space sinc)."""
        npad = int(np.ceil(tophatwidth))
        npad += (4 - npad) % 4
        npl, ny, nx = cube.shape
        out = np.zeros((npl, ny + 2 * npad, nx + 2 * npad))
        out[:, npad:-npad, npad:-npad] = cube
        uy = np.fft.fftfreq(out.shape[1])
        ux = np.fft.fftfreq(out.shape[2])
        s = np.sinc(ux[None, :] * tophatwidth) * np.sinc(uy[:, None] * tophatwidth)
        out = np.real(np.fft.ifft2(np.fft.fft2(out) * s[None]))
        return out[:, npad:-npad, npad:-npad] if npad else out

    @staticmethod
    def gauss_deconv(arr, C, eps=1e-3):
        """Wiener-regularized Gaussian deconvolution (2x2 covariance C)."""
        n = arr.shape[1]
        big = np.zeros((2 * n, 2 * n), dtype=np.complex128)
        big[:n, :n] = arr
        ft = np.fft.fft2(big)
        u_ = np.fft.fftfreq(2 * n)
        u, v = np.meshgrid(u_, u_)
        gwin = np.exp(-2 * np.pi ** 2 * (C[0, 0] * u ** 2 + C[1, 1] * v ** 2
                                         + 2 * C[0, 1] * u * v))
        ft = ft * gwin / (gwin ** 2 + eps ** 2)
        return np.fft.ifft2(ft).real[:n, :n].astype(arr.dtype)

    @staticmethod
    def gauss_stamp(n, C):
        """Centered Gaussian stamp with covariance C (n even)."""
        ax = np.linspace((1 - n) / 2.0, (n - 1) / 2.0, n)
        xx, yy = np.meshgrid(ax, ax)
        detC = C[0, 0] * C[1, 1] - C[0, 1] ** 2
        iC = np.array([[C[1, 1], -C[0, 1]], [-C[0, 1], C[0, 0]]]) / detC
        return np.exp(-0.5 * (iC[0, 0] * xx ** 2 + iC[1, 1] * yy ** 2)
                      - iC[0, 1] * xx * yy) / (2 * np.pi * np.sqrt(detC))

    def __init__(self, psfcube, wcs_, pars):
        self.ref_pixscale = pars.get("ref_pixscale", 0.11)
        self.oversamp = pars.get("oversamp", 8)
        self.tophat_in = pars.get("tophat_in", False)
        self.largestamp_size = psfcube.shape[1]
        self.smallstamp_size = pars.get("smallstamp_size", self.largestamp_size)
        self.nside = pars.get("nside", Stn.sca_nside)
        self.r_in = pars.get("r_in", 4.0)
        self.r_out = pars.get("r_out", 9.0)
        self.sigmaGamma = pars.get("sigmaGamma", 1.0)
        self.eps = pars.get("eps", 0.02)
        self.m_trunc = pars.get("m_trunc", 0)

        self.psfcube = np.copy(psfcube) if self.tophat_in \
            else SplitPSF.tophatfilter(psfcube, self.oversamp)
        self.wcs_ = wcs_

        self.npoly = psfcube.shape[0]
        self.lorder = int(np.round(np.sqrt(self.npoly))) - 1
        if self.smallstamp_size % 2 or self.largestamp_size % 2:
            raise ValueError("SplitPSF requires even dimension")
        if (self.lorder + 1) ** 2 != self.npoly:
            raise ValueError("SplitPSF Legendre polynomial dimension error")

    def build(self):
        """Compute smallpsf (G^S), K_Legendre, per-node K/zeta, and Cov."""
        n = self.largestamp_size
        W = SplitPSF.window_2d(n, self.oversamp * self.r_in, self.oversamp * self.r_out)
        ntrim = (n - self.smallstamp_size) // 2
        self.smallpsf = W[None] * self.psfcube
        if ntrim > 0:
            self.smallpsf = self.smallpsf[:, ntrim:-ntrim, ntrim:-ntrim]
        resid = self.psfcube * (1 - W)[None] * SplitPSF.truncate_2d(n, self.m_trunc)[None]

        xL, wL = roots_legendre(self.lorder + 1)
        xg, yg = (a.ravel() for a in np.meshgrid(xL, xL))
        wg = np.outer(wL, wL).ravel()
        var_ref = (self.oversamp * self.sigmaGamma) ** 2

        self.K_Legendre = np.zeros((self.npoly, n, n))
        self.K_real = np.zeros((self.npoly, n, n))
        self.zeta_real = np.zeros((self.npoly, n, n))
        self.Cov = np.zeros((self.npoly, 2, 2))
        lrange = np.arange(self.lorder + 1)
        for i in range(self.npoly):
            if self.wcs_ is None:
                self.Cov[i] = var_ref * np.identity(2)
            else:
                cpt = [self.nside / 2.0 * (1 + xg[i]), self.nside / 2.0 * (1 + yg[i])]
                jac = local_partial_pixel_derivatives2(self.wcs_, *cpt)
                self.Cov[i] = var_ref * np.linalg.inv(jac.T @ jac) \
                    * (self.ref_pixscale / 3600) ** 2

            lpw = np.outer(eval_legendre(lrange, yg[i]),
                           eval_legendre(lrange, xg[i])).ravel()
            locLRP = np.einsum("a,aij->ij", lpw, resid)
            self.K_real[i] = SplitPSF.gauss_deconv(locLRP, self.Cov[i], eps=self.eps)
            self.zeta_real[i] = locLRP - scipy.signal.convolve(
                self.K_real[i], SplitPSF.gauss_stamp(n, self.Cov[i]),
                mode="same", method="fft")
            self.K_Legendre += wg[i] * np.tensordot(lpw, self.K_real[i], axes=0)

        lnorm = np.outer(lrange + 0.5, lrange + 0.5).ravel()
        self.K_Legendre *= lnorm[:, None, None]


def split_psf_to_fits(psf_file, wcs_list, pars, outfile):
    """
    Split every SCA's PSF cube in a PSF file and write the combined output:
    HDUs [1..nsca] = short-range cubes, [nsca+1..2nsca] = K kernels; the
    primary header records GSSKIP/KERSKIP offsets (reference
    splitpsf.py:287-397 layout).
    """
    hdus_in = fits_read(psf_file)
    nsca = len(hdus_in) - 1
    out = [ImageHDU(None)]
    kerns = []
    for isca in range(1, nsca + 1):
        cube = np.asarray(hdus_in[isca].data, dtype=np.float64)
        wcs_ = wcs_list[isca - 1] if wcs_list is not None else None
        sp = SplitPSF(cube, wcs_, pars)
        sp.build()
        out.append(ImageHDU(sp.smallpsf.astype(np.float32)))
        kerns.append(ImageHDU(sp.K_Legendre.astype(np.float32)))
    hdr = Header()
    hdr["GSSKIP"] = 0
    hdr["KERSKIP"] = nsca
    out[0].header = hdr
    fits_write(outfile, HDUList(out + kerns))
    return outfile


def split_all_psfs(jobs, pars, nworkers: int = None) -> list:
    """
    Split every observation's PSF file (reference
    splitpsf_wrapper.py:14-161).

    jobs : list of (psf_file, wcs_list, outfile) work items; independent,
    so with nworkers > 1 they run in a forkserver process pool (matching
    the reference's executor), otherwise serially in-process.
    """
    if nworkers and nworkers > 1:
        import concurrent.futures as cf
        import multiprocessing as mp

        ctx = mp.get_context("forkserver")
        with cf.ProcessPoolExecutor(max_workers=nworkers,
                                    mp_context=ctx) as ex:
            futs = [ex.submit(split_psf_to_fits, pf, wl, pars, of)
                    for pf, wl, of in jobs]
            return [fu.result() for fu in futs]
    return [split_psf_to_fits(pf, wl, pars, of) for pf, wl, of in jobs]
