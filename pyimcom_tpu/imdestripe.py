"""
Destriping: removal of correlated row-stripe noise before coaddition.

Counterpart of reference src/pyimcom/imdestripe.py (Laliotis et al. 2026).
Each exposure's stripe parameters (one offset per detector row, optionally
plus per-amplifier column blocks) are fit by minimizing

    eps = sum_A sum_pixels f( I_A - P_A(params) - J_A )

where J_A is the (destriped) overlap prediction interpolated from the
neighboring exposures, and f is a quadratic / absolute / Huber penalty.
The gradient flows both through the direct term (row sums of f') and back
through every neighbor's interpolation (the exact adjoint of the bilinear
resampling), and the minimization is nonlinear conjugate gradient with an
exact quadratic line search, wall-time checkpointing, and pickle restart.

The bilinear forward/adjoint pair here is vectorized numpy; the dot-product
adjoint identity is exact by construction (tested).
"""

from __future__ import annotations

import glob
import os
import pickle
import re
import time

import numpy as np

from .config import Config, Settings as Stn
from .fitsio import HDUList, Header, ImageHDU, fits_read, fits_write
from .utils import compareutils
from .wcsutil import WCS


# ---------------------------------------------------------------------------
# bilinear resampling operators (exact adjoint pair)
# ---------------------------------------------------------------------------

def bilinear_gather(image: np.ndarray, xf: np.ndarray, yf: np.ndarray,
                    g_eff: np.ndarray = None) -> np.ndarray:
    """
    Bilinear interpolation of `image` at positions (xf, yf); out-of-bounds
    positions give 0.  With `g_eff`, taps are gain-weighted and normalized.
    Matches the furry-parakeet bilinear_interpolation contract (valid region
    excludes the last row/column).  On accelerators the gather runs on
    device (ops.bilinear); the host path is the numpy reference.
    """
    import jax

    if jax.default_backend() != "cpu":
        import jax.numpy as jnp

        from .ops.bilinear import (
            bilinear_gather_device,
            bilinear_gather_weighted_device,
        )

        if g_eff is not None:
            out = bilinear_gather_weighted_device(
                jnp.asarray(image), jnp.asarray(xf), jnp.asarray(yf),
                jnp.asarray(g_eff))
        else:
            out = bilinear_gather_device(jnp.asarray(image),
                                         jnp.asarray(xf), jnp.asarray(yf))
        return np.asarray(out)

    ny, nx = image.shape
    x0 = np.floor(xf).astype(np.int64)
    y0 = np.floor(yf).astype(np.int64)
    inb = (x0 >= 0) & (x0 < nx - 1) & (y0 >= 0) & (y0 < ny - 1)
    x0c = np.clip(x0, 0, nx - 2)
    y0c = np.clip(y0, 0, ny - 2)
    fx = xf - x0c
    fy = yf - y0c
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    if g_eff is not None:
        g00 = g_eff[y0c, x0c]
        g10 = g_eff[y0c, x0c + 1]
        g01 = g_eff[y0c + 1, x0c]
        g11 = g_eff[y0c + 1, x0c + 1]
        norm = w00 * g00 + w10 * g10 + w01 * g01 + w11 * g11
        norm = np.where(norm > 0, norm, 1.0)
        out = (w00 * g00 * image[y0c, x0c] + w10 * g10 * image[y0c, x0c + 1]
               + w01 * g01 * image[y0c + 1, x0c] + w11 * g11 * image[y0c + 1, x0c + 1]) / norm
    else:
        out = (w00 * image[y0c, x0c] + w10 * image[y0c, x0c + 1]
               + w01 * image[y0c + 1, x0c] + w11 * image[y0c + 1, x0c + 1])
    return np.where(inb, out, 0.0)


def bilinear_scatter_adjoint(values: np.ndarray, xf: np.ndarray, yf: np.ndarray,
                             shape) -> np.ndarray:
    """
    Exact adjoint of :func:`bilinear_gather` (without gain weighting):
    scatter each value back onto the source grid with the same weights.
    On accelerators the scatter runs on device (ops.bilinear).
    """
    import jax

    if jax.default_backend() != "cpu":
        import jax.numpy as jnp

        from .ops.bilinear import bilinear_scatter_adjoint_device

        out = bilinear_scatter_adjoint_device(
            jnp.asarray(values), jnp.asarray(xf), jnp.asarray(yf),
            tuple(shape))
        return np.asarray(out)

    ny, nx = shape
    x0 = np.floor(xf).astype(np.int64)
    y0 = np.floor(yf).astype(np.int64)
    inb = (x0 >= 0) & (x0 < nx - 1) & (y0 >= 0) & (y0 < ny - 1)
    x0c = np.clip(x0, 0, nx - 2)[inb]
    y0c = np.clip(y0, 0, ny - 2)[inb]
    fx = (xf - np.clip(x0, 0, nx - 2))[inb]
    fy = (yf - np.clip(y0, 0, ny - 2))[inb]
    v = values[inb]
    out = np.zeros(shape)
    np.add.at(out, (y0c, x0c), v * (1 - fx) * (1 - fy))
    np.add.at(out, (y0c, x0c + 1), v * fx * (1 - fy))
    np.add.at(out, (y0c + 1, x0c), v * (1 - fx) * fy)
    np.add.at(out, (y0c + 1, x0c + 1), v * fx * fy)
    return out


# reference-compatible wrappers -------------------------------------------

def interpolate_image_bilinear(image_B, image_A, interpolated_image, mask=None):
    """Interpolate SCA B onto SCA A's grid (reference imdestripe.py:972)."""
    xf, yf, _ = compareutils.map_sca2sca(image_A.w, image_B.w, pad=0,
                                         nside=image_A.image.shape[-1])
    if mask is not None and isinstance(mask, np.ndarray):
        interpolated_image[:] = bilinear_gather(mask, xf, yf).reshape(image_A.image.shape)
    else:
        interpolated_image[:] = bilinear_gather(image_B.image, xf, yf,
                                                g_eff=image_B.g_eff).reshape(image_A.image.shape)


def transpose_interpolate(image_A, wcs_A, image_B, original_image):
    """Adjoint interpolation from A's grid back onto B (imdestripe.py:1001)."""
    xf, yf, _ = compareutils.map_sca2sca(wcs_A, image_B.w, pad=0,
                                         nside=image_A.shape[-1])
    original_image[:] = bilinear_scatter_adjoint(image_A.ravel(), xf.ravel(),
                                                 yf.ravel(), image_B.image.shape)


# ---------------------------------------------------------------------------
# stripe parameter model
# ---------------------------------------------------------------------------

def forward_par(params: np.ndarray, shape, amp_cols: int = None) -> np.ndarray:
    """
    Stripe image from parameters: params[:ny] broadcast along rows; with
    `amp_cols`, the remaining params are per-column-block offsets
    (reference Parameters.forward_par, imdestripe.py:670).
    """
    ny, nx = shape
    img = np.broadcast_to(params[:ny, None], (ny, nx)).copy()
    if amp_cols:
        nblk = nx // amp_cols
        for b in range(nblk):
            img[:, b * amp_cols:(b + 1) * amp_cols] += params[ny + b]
    return img


def transpose_par(img: np.ndarray, cfg=None) -> np.ndarray:
    """Adjoint of forward_par: row sums (+ column-block sums if enabled)."""
    row = np.sum(img, axis=1)
    amp_cols = getattr(cfg, "amp_cols", None) if cfg is not None else None
    if amp_cols:
        nblk = img.shape[1] // amp_cols
        col = np.array([np.sum(img[:, b * amp_cols:(b + 1) * amp_cols])
                        for b in range(nblk)])
        return np.concatenate([row, col])
    return row


def n_params(shape, amp_cols=None) -> int:
    ny, nx = shape
    return ny + (nx // amp_cols if amp_cols else 0)


# ---------------------------------------------------------------------------
# penalty functions
# ---------------------------------------------------------------------------

def penalty(r: np.ndarray, model: str, hub: float = 1.0):
    """(f(r), f'(r)) for the configured cost model."""
    if model in (None, "quadratic"):
        return 0.5 * r * r, r
    if model == "absolute":
        return np.abs(r), np.sign(r)
    if model == "huber_loss":
        a = np.abs(r)
        f = np.where(a <= hub, 0.5 * r * r, hub * (a - 0.5 * hub))
        fp = np.where(a <= hub, r, hub * np.sign(r))
        return f, fp
    raise ValueError(f"unknown cost model {model!r}")


# ---------------------------------------------------------------------------
# SCA container
# ---------------------------------------------------------------------------

class Sca_img:
    """One exposure: image, WCS, effective gain, and current stripe params."""

    def __init__(self, image, wcs, g_eff=None, name=""):
        self.image = np.asarray(image, dtype=np.float64)
        self.w = wcs
        self.name = name
        if g_eff is None:
            g_eff = np.ones_like(self.image)
        self.g_eff = np.asarray(g_eff, dtype=np.float64)

    def destriped(self, params, amp_cols=None):
        return self.image - forward_par(params, self.image.shape, amp_cols)


# ---------------------------------------------------------------------------
# cost and gradient over the exposure set
# ---------------------------------------------------------------------------

class DestripeProblem:
    """
    The destriping optimization problem over a set of overlapping SCAs.

    Parameters
    ----------
    scas : list of Sca_img
    neighbors : dict i -> list of j (overlap fraction above threshold)
    cost_model : 'quadratic' | 'absolute' | 'huber_loss'
    """

    def __init__(self, scas, neighbors, cost_model="quadratic", hub_thresh=1.0,
                 amp_cols=None, mask=None):
        self.scas = scas
        self.neighbors = neighbors
        self.cost_model = cost_model
        self.hub = hub_thresh
        self.amp_cols = amp_cols
        self.npar_each = [n_params(s.image.shape, amp_cols) for s in scas]
        self.offsets = np.concatenate([[0], np.cumsum(self.npar_each)])
        self.mask = mask  # optional list of bool arrays (True = use pixel)
        # precompute pixel mappings per (target, reference) pair
        self._maps = {}
        for i, js in neighbors.items():
            for j in js:
                if (i, j) not in self._maps:
                    nside = scas[i].image.shape[-1]
                    self._maps[(i, j)] = compareutils.map_sca2sca(
                        scas[i].w, scas[j].w, pad=0, nside=nside)

    def split(self, params):
        return [params[self.offsets[i]:self.offsets[i + 1]]
                for i in range(len(self.scas))]

    def _destriped_images(self, params):
        ps = self.split(params)
        return [s.destriped(p, self.amp_cols) for s, p in zip(self.scas, ps)]

    def _interpolated(self, imgs, i):
        """Average of neighbors' destriped images on SCA i's grid."""
        acc = np.zeros_like(imgs[i])
        cnt = np.zeros_like(imgs[i])
        for j in self.neighbors.get(i, []):
            xf, yf, _ = self._maps[(i, j)]
            interp = bilinear_gather(imgs[j], xf, yf,
                                     g_eff=self.scas[j].g_eff).reshape(imgs[i].shape)
            hit = bilinear_gather(np.ones_like(imgs[j]), xf, yf).reshape(imgs[i].shape)
            acc += interp
            cnt += hit > 0.999
        with np.errstate(invalid="ignore", divide="ignore"):
            J = acc / cnt
        valid = cnt > 0
        return np.where(valid, J, 0.0), valid

    def cost(self, params) -> float:
        imgs = self._destriped_images(params)
        eps = 0.0
        for i in range(len(self.scas)):
            if not self.neighbors.get(i):
                continue
            J, valid = self._interpolated(imgs, i)
            r = np.where(valid, imgs[i] - J, 0.0)
            if self.mask is not None:
                r = np.where(self.mask[i], r, 0.0)
            f, _ = penalty(r, self.cost_model, self.hub)
            eps += float(np.sum(f))
        return eps

    def gradient(self, params) -> np.ndarray:
        """
        d eps / d params: direct term through I_i plus the adjoint term
        through every neighbor's contribution to J_i
        (reference residual_function, imdestripe.py:1231-1410).
        """
        imgs = self._destriped_images(params)
        grad = np.zeros_like(params)
        for i in range(len(self.scas)):
            js = self.neighbors.get(i)
            if not js:
                continue
            J, valid = self._interpolated(imgs, i)
            r = np.where(valid, imgs[i] - J, 0.0)
            if self.mask is not None:
                r = np.where(self.mask[i], r, 0.0)
            _, fp = penalty(r, self.cost_model, self.hub)
            # direct term: d r / d params_i = -forward_par' -> -transpose_par
            gi = -transpose_par(fp, self._cfg_like())
            grad[self.offsets[i]:self.offsets[i + 1]] += gi
            # neighbor terms: dJ_i/dparams_j = -interp(forward_par)/count
            _, cnt = self._interp_count(i)
            fp_n = np.where(cnt > 0, fp / np.maximum(cnt, 1), 0.0)
            for j in js:
                xf, yf, _ = self._maps[(i, j)]
                back = bilinear_scatter_adjoint(fp_n.ravel(), xf.ravel(), yf.ravel(),
                                                imgs[j].shape)
                gj = transpose_par(back, self._cfg_like())
                grad[self.offsets[j]:self.offsets[j + 1]] += gj
        return grad

    def _interp_count(self, i):
        cnt = np.zeros_like(self.scas[i].image)
        for j in self.neighbors.get(i, []):
            xf, yf, _ = self._maps[(i, j)]
            hit = bilinear_gather(np.ones_like(self.scas[j].image), xf, yf
                                  ).reshape(cnt.shape)
            cnt += hit > 0.999
        return None, cnt

    def _cfg_like(self):
        class _C:
            amp_cols = self.amp_cols
        return _C() if self.amp_cols else None


# ---------------------------------------------------------------------------
# nonlinear conjugate gradient with checkpoint/restart
# ---------------------------------------------------------------------------

def conjugate_gradient(problem: DestripeProblem, params0=None, maxiter: int = 30,
                       tol: float = 1e-8, beta_model: str = "PR",
                       restart_file: str = None, time_limit: float = None,
                       log=print):
    """
    Minimize the destriping cost.  Supports Fletcher-Reeves ('FR') and
    Polak-Ribiere ('PR') beta updates, an exact quadratic line search (3-point
    parabola; exact for the quadratic cost model), pickle checkpoint/restart,
    and a wall-time watchdog (reference imdestripe.py:1999-2294).
    """
    t_start = time.time()
    ntot = problem.offsets[-1]
    params = np.zeros(ntot) if params0 is None else np.array(params0, dtype=np.float64)
    it0 = 0
    g = d = None

    if restart_file and os.path.exists(restart_file):
        with open(restart_file, "rb") as f:
            state = pickle.load(f)
        params = state["params"]
        g = state["g"]
        d = state["d"]
        it0 = state["iteration"] + 1
        log(f"restarted CG from {restart_file} at iteration {it0}")

    if g is None:
        g = problem.gradient(params)
        d = -g

    history = []
    for it in range(it0, maxiter):
        gnorm = float(np.dot(g, g))
        if np.sqrt(gnorm) < tol:
            log(f"CG converged at iteration {it}: |g| = {np.sqrt(gnorm):.3e}")
            break

        # exact quadratic line search: fit a parabola through 3 cost samples
        e0 = problem.cost(params)
        scale = 1.0 / max(np.max(np.abs(d)), 1e-30)
        t1 = scale
        e1 = problem.cost(params + t1 * d)
        e2 = problem.cost(params + 2 * t1 * d)
        denom = e0 - 2 * e1 + e2
        tstar = t1 * (0.5 if abs(denom) < 1e-300 else
                      np.clip((3 * e0 - 4 * e1 + e2) / (4 * denom) * 2, -10, 10))
        # fall back to the best sampled point if the parabola is degenerate
        if not np.isfinite(tstar) or problem.cost(params + tstar * d) > min(e0, e1, e2):
            tstar = [0.0, t1, 2 * t1][int(np.argmin([e0, e1, e2]))]
        params = params + tstar * d

        g_new = problem.gradient(params)
        if beta_model == "FR":
            beta = float(np.dot(g_new, g_new) / max(gnorm, 1e-300))
        else:  # PR with restart
            beta = float(np.dot(g_new, g_new - g) / max(gnorm, 1e-300))
            beta = max(beta, 0.0)
        d = -g_new + beta * d
        g = g_new
        e_now = problem.cost(params)
        history.append({"iteration": it, "cost": e_now, "gnorm": np.sqrt(gnorm),
                        "step": tstar, "beta": beta, "t": time.time() - t_start})
        log(f"CG iter {it}: cost = {e_now:.6e}  |g| = {np.sqrt(gnorm):.3e} "
            f"step = {tstar:.3e} beta = {beta:.3f}")

        if restart_file:
            with open(restart_file + ".tmp", "wb") as f:
                pickle.dump({"params": params, "g": g, "d": d, "iteration": it,
                             "history": history}, f)
            os.replace(restart_file + ".tmp", restart_file)
        if time_limit is not None and time.time() - t_start > time_limit:
            log(f"CG wall-time limit reached at iteration {it}; checkpointed")
            break

    return params, history


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def get_scas(cfg):
    """Load destriping input SCAs named by DSOBSFILE glob (FITS only)."""
    scas = []
    names = []
    pattern = cfg.ds_obsfile
    for f in sorted(glob.glob(pattern)):
        m = re.search(r"(\w\d+)_(\d+)_(\d+)", os.path.basename(f))
        if not m:
            continue
        hdus = fits_read(f)
        hdr = None
        for h in hdus:
            if "CTYPE1" in h.header:
                hdr = h.header
                break
        w = WCS.from_header(hdr)
        scas.append(Sca_img(np.asarray(hdus[0].data, dtype=np.float64), w,
                            name=m.group(0)))
        names.append(m.group(0))
    return scas, names


def main(cfg: Config, maxiter=None, out_path=None):
    """
    Full destriping run from a configuration: find overlaps, fit stripe
    parameters, write destriped FITS triplets (DS image, original, params).
    """
    scas, names = get_scas(cfg)
    if len(scas) < 2:
        raise RuntimeError("destriping needs at least two overlapping exposures")
    ov = compareutils.get_overlap_matrix([s.w for s in scas], subsamp=16,
                                         nside=scas[0].image.shape[-1])
    neighbors = {i: [j for j in range(len(scas)) if j != i and ov[i, j] > 0.1]
                 for i in range(len(scas))}

    problem = DestripeProblem(scas, neighbors, cost_model=cfg.cost_model or "quadratic",
                              hub_thresh=cfg.hub_thresh or 1.0,
                              amp_cols=cfg.amp_cols)
    params, history = conjugate_gradient(
        problem, maxiter=maxiter or (cfg.cg_maxiter or 10),
        tol=cfg.cg_tol or 1e-8,
        restart_file=(cfg.ds_restart or None))

    outdir = out_path or cfg.ds_outpath or "."
    os.makedirs(outdir, exist_ok=True)
    ps = problem.split(params)
    for s, p, name in zip(scas, ps, names):
        hdr = Header(s.w.to_header())
        hdus = HDUList([
            ImageHDU(s.destriped(p, cfg.amp_cols).astype(np.float32), header=hdr),
            ImageHDU(s.image.astype(np.float32), name="ORIG"),
            ImageHDU(p.astype(np.float32), name="PARAMS"),
        ])
        fits_write(os.path.join(outdir, f"{cfg.ds_outstem or 'ds'}_{name}.fits"), hdus)
    return params, history
