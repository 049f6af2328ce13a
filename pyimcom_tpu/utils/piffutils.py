"""
Piff PSF model ingestion without the `piff` package.

Counterpart of reference src/pyimcom/utils/piffutils.py (PiffPSFModel:
oversampled drawing of Piff PSF solutions; piff_to_legendre conversion,
piffutils.py:19-213).  The reference delegates the file parsing and
rendering to the `piff` package; neither `piff` nor GalSim exist in this
environment, so this module reads the Piff FITS serialization directly and
renders the model with the library's own band-limited interpolators.

Supported subset (the standard Roman/DES configuration):

* PSF type ``Simple`` / ``SimplePSF`` -- one model + one interpolant.
* Model ``PixelGrid(scale, size, centered)`` -- the PSF is a ``size x size``
  grid of free pixel values with grid spacing ``scale`` (native pixels in
  this module's convention), rendered by band-limited interpolation.  Piff
  renders with GalSim's ``Lanczos(7)``; here the D5512 10x10 kernel is used
  -- both are windowed-sinc approximants and agree to the kernel accuracy
  (<1e-6 for band-limited content).
* Interpolant ``BasisPolynomial(order)`` over chip coordinates normalized to
  u = (x - (nside-1)/2) / ((nside-1)/2), v likewise: the PixelGrid parameter
  vector at a position is q @ basis(u, v) with monomial basis
  {u^i v^j : i + j <= order}, column-major in (i, j) with j (v) outermost.

File layout read (written by piff's fitsio serialization):

* HDU ``psf``: single-row table with column ``type``.
* HDU ``psf/model``: columns ``type``, ``scale``, ``size`` (and optional
  ``centered``, ``interp`` -- accepted, interpolation always D5512 here).
* HDU ``psf/interp``: columns ``type``, ``order``.
* HDU ``psf/interp/solution``: column ``q``, either with TDIM metadata or
  with NPARAM/NBASIS header keys, reshaped to (nparam, nbasis).

Multi-chip files may repeat this layout under ``psf_{chipnum}/...``
prefixes; single-solution files are used for every chip.

`write_piff_file` produces files in this exact subset (used by the test
fixture and useful for converting models from other sources).
"""

from __future__ import annotations

import numpy as np
from scipy.special import roots_legendre

from ..config import Settings as Stn
from ..fitsio import HDUList, Header, ImageHDU, TableHDU, fits_read, fits_write


def _basis_exponents(order: int):
    """Monomial exponents (i, j) with i + j <= order, j (v) outermost."""
    return [(i, j) for j in range(order + 1) for i in range(order + 1 - j)]


def _table_value(hdu, col, default=None):
    try:
        val = hdu[col]
    except (KeyError, TypeError):
        return default
    arr = np.asarray(val)
    if arr.ndim >= 1 and arr.shape[0] >= 1:
        v = arr.reshape(-1)[0] if arr.dtype.kind != "U" else arr[0]
    else:
        v = arr
    if isinstance(v, bytes):
        v = v.decode()
    return v


class PiffPSFModel:
    """
    A Piff PSF solution, loaded from its FITS serialization and rendered
    without the piff package (reference PiffPSFModel, piffutils.py:19-96).

    Parameters
    ----------
    psf_file : str -- path to the ``.piff`` FITS file.
    sca : int -- SCA/chip number (1-based); files with per-chip solutions
        use the ``psf_{sca-1}`` HDU prefix, single-solution files apply to
        every chip.
    nside : int -- chip size in pixels (normalization of the interpolation
        coordinates).
    """

    def __init__(self, psf_file, sca, nside: int = Stn.sca_nside):
        self.sca = sca
        self.nside = nside
        hdus = fits_read(psf_file)
        names = {h.name for h in hdus if h.name}
        prefix = "psf"
        if f"psf_{sca - 1}/model" in names:
            prefix = f"psf_{sca - 1}"
        if f"{prefix}/model" not in names:
            raise ValueError(f"{psf_file}: no '{prefix}/model' HDU; not a "
                             "supported Piff file")

        model = hdus[f"{prefix}/model"]
        mtype = str(_table_value(model, "type", "PixelGrid"))
        if "PixelGrid" not in mtype:
            raise NotImplementedError(
                f"Piff model type {mtype!r} not supported (PixelGrid only)")
        self.scale = float(_table_value(model, "scale", 1.0))
        self.size = int(_table_value(model, "size"))

        interp = hdus[f"{prefix}/interp"]
        itype = str(_table_value(interp, "type", "BasisPolynomial"))
        if "Polynomial" not in itype:
            raise NotImplementedError(
                f"Piff interp type {itype!r} not supported "
                "(BasisPolynomial only)")
        self.order = int(_table_value(interp, "order", 0))
        self.exponents = _basis_exponents(self.order)

        sol = hdus[f"{prefix}/interp/solution"]
        if hasattr(sol, "names") and "q" in getattr(sol, "names", []):
            q = np.asarray(sol["q"], dtype=np.float64).reshape(-1)
            npar = sol.header.get("NPARAM")
            nbas = sol.header.get("NBASIS")
            tdim = sol.header.get("TDIM1")
            if npar and nbas:
                q = q.reshape(int(npar), int(nbas))
            elif tdim:
                dims = [int(t) for t in str(tdim).strip("() ").split(",")]
                q = q.reshape(dims[::-1])
            else:
                q = q.reshape(-1, len(self.exponents))
        else:  # image-HDU fallback
            q = np.asarray(sol.data, dtype=np.float64)
        if q.shape[0] == len(self.exponents) and q.shape[0] != self.size ** 2:
            q = q.T  # stored (nbasis, nparam)
        if q.shape != (self.size ** 2, len(self.exponents)):
            raise ValueError(
                f"Piff solution shape {q.shape} does not match "
                f"size^2={self.size ** 2} x nbasis={len(self.exponents)}")
        self.q = q

    def basis(self, x, y):
        """Interpolation basis vector at chip position (x, y), 0-based."""
        half = (self.nside - 1) / 2.0
        u = (x - half) / half
        v = (y - half) / half
        return np.array([u ** i * v ** j for (i, j) in self.exponents])

    def params(self, x, y):
        """PixelGrid pixel values at chip position (x, y): (size, size)."""
        return (self.q @ self.basis(x, y)).reshape(self.size, self.size)

    def draw(self, x, y, stamp_size=48, oversamp=8, normbox=None):
        """
        Oversampled PSF stamp at chip position (x, y).

        Same contract as the reference draw (piffutils.py:45-96): the stamp
        has ``stamp_size*oversamp`` samples per side with flux per SAMPLE
        (sums to ~1/oversamp^2 per native pixel), centered at
        ((n-1)/2, (n-1)/2).
        """
        import jax.numpy as jnp

        from ..ops.interp import grid_interp, grid_interp_dense
        from ..psfgrp import INTERP_PAD, _use_dense, compute_dtype

        grid = self.params(x, y)
        if normbox is not None:
            # normalize so the central normbox x normbox native-pixel
            # region of the model grid integrates to 1
            c = (self.size - 1) / 2.0
            lo = int(np.ceil(c - normbox / 2.0))
            hi = int(np.floor(c + normbox / 2.0)) + 1
            grid = grid / np.sum(grid[lo:hi, lo:hi])

        ns = stamp_size * oversamp
        ctr_out = (ns - 1) / 2.0
        ctr_grid = (self.size - 1) / 2.0
        # the stamp grid is separable, so the separable-grid interpolator
        # does O(taps * ns^2) work instead of O(taps^2 * ns^2) point queries
        ax = (np.arange(ns) - ctr_out) / (oversamp * self.scale) + ctr_grid \
            + INTERP_PAD
        pad = np.pad(grid, INTERP_PAD)
        fn = grid_interp_dense if _use_dense() else grid_interp
        dt = compute_dtype()
        vals = np.asarray(fn(jnp.asarray(pad, dtype=dt),
                             jnp.asarray(ax[None, :], dtype=dt),
                             jnp.asarray(ax[None, :], dtype=dt)))[0]
        return (vals / oversamp ** 2).astype(np.float32)


def write_piff_file(fname, q, size, order, scale=1.0, chipnums=None):
    """
    Write a PixelGrid+BasisPolynomial solution in the supported Piff
    layout.  `q` is (size*size, nbasis), or a dict chipnum -> q for
    per-chip solutions.
    """
    def solution_hdus(prefix, qq):
        nb = len(_basis_exponents(order))
        if qq.shape != (size * size, nb):
            raise ValueError(f"q shape {qq.shape} != ({size * size}, {nb})")
        mod = TableHDU(data={"type": np.array(["PixelGrid"]),
                             "scale": np.array([scale]),
                             "size": np.array([size]),
                             "centered": np.array([1])},
                       name=f"{prefix}/model")
        itp = TableHDU(data={"type": np.array(["BasisPolynomial"]),
                             "order": np.array([order])},
                       name=f"{prefix}/interp")
        sol = TableHDU(data={"q": qq.reshape(1, -1)},
                       name=f"{prefix}/interp/solution")
        sol.header["NPARAM"] = size * size
        sol.header["NBASIS"] = nb
        return [mod, itp, sol]

    hdus = [ImageHDU(np.zeros((1,), dtype=np.float32)),
            TableHDU(data={"type": np.array(["Simple"])}, name="psf")]
    if isinstance(q, dict):
        for chip, qq in q.items():
            hdus += solution_hdus(f"psf_{chip}", np.asarray(qq))
    else:
        hdus += solution_hdus("psf", np.asarray(q))
    fits_write(fname, HDUList(hdus))


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


def piff_to_legendre(psf_file, sca, stamp_size=128, oversamp=6,
                     legendre_order=5, normbox=None):
    """Draw a Piff solution over the chip and fit the Legendre cube
    (reference piff_to_legendre, piffutils.py:98-213)."""
    model = PiffPSFModel(psf_file, sca)

    def draw(x, y):
        return model.draw(x, y, stamp_size=stamp_size, oversamp=oversamp,
                          normbox=normbox)

    return psf_stamps_to_legendre_cube(draw, legendre_order,
                                       nside=model.nside).astype(np.float32)


def piff_to_legendre_multi(psf_file, out_file, format="L2_2506", chips=None,
                           stamp_size=128, oversamp=6, legendre_order=5,
                           normbox=None):
    """
    Convert a Piff file to a PyIMCOM Legendre-cube PSF input file
    (reference piff_to_legendre_multi, piffutils.py:230-320; L2_2506
    layout: primary header + one image HDU per SCA).
    """
    if format != "L2_2506":
        raise ValueError(f"piff_to_legendre_multi: Bad format: {format}")

    ns = stamp_size * oversamp
    xmin = (ns - oversamp) // 2
    placeholder = np.zeros(((legendre_order + 1) ** 2, ns, ns),
                           dtype=np.float32)
    placeholder[0, xmin:xmin + oversamp, xmin:xmin + oversamp] = \
        1.0 / oversamp ** 2

    nsca = np.shape(Stn.SCAFov)[0]
    chips = list(range(1, nsca + 1)) if chips is None else chips
    coefs = [placeholder] * nsca
    for i in chips:
        coefs[i - 1] = piff_to_legendre(
            psf_file, i, stamp_size=stamp_size, oversamp=oversamp,
            legendre_order=legendre_order, normbox=normbox)

    hdr = Header()
    hdr["CFORMAT"] = "Legendre basis"
    hdr["PORDER"] = legendre_order
    hdr["NCOEF"] = (legendre_order + 1) ** 2
    hdr["SRC"] = str(psf_file)
    hdr["NSCA"] = nsca
    hdr["OVSAMP"] = oversamp
    hdus = [ImageHDU(np.zeros((1,), dtype=np.float32), header=hdr)]
    for i in range(1, nsca + 1):
        h = ImageHDU(coefs[i - 1])
        h.header["SCA"] = i
        hdus.append(h)
    fits_write(out_file, HDUList(hdus))
