"""
Device-resident destriping cost/gradient.

The reference destriper evaluates its cost and gradient with C bilinear
kernels fanned out over a process pool (reference imdestripe.py:996-1026,
1288-1307, 1636-1654), hand-writing the adjoint of every term.  The
TPU-native equivalent keeps every SCA image, gain map, mask, and pair
mapping resident in HBM and expresses the WHOLE cost -- stripe model,
gain-weighted bilinear resampling onto neighbor grids, penalty model,
amplifier boundary-continuity term -- as one differentiable JAX function;
``jax.value_and_grad`` then yields the exact gradient through every term
(including the gain weighting the host path approximates) in a single
compiled program per CG iteration.  Pair accumulation runs as a
``lax.scan`` over ordered SCA pairs with rematerialization, so peak memory
is one (S, npix) accumulator pair instead of P interpolation planes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _gather_weighted(image, ge, xf, yf):
    """Gain-weighted normalized 4-tap gather (imdestripe.bilinear_gather
    with g_eff; out-of-bounds -> 0, valid region excludes last row/col)."""
    ny, nx = image.shape
    x0 = jnp.floor(xf).astype(jnp.int32)
    y0 = jnp.floor(yf).astype(jnp.int32)
    inb = (x0 >= 0) & (x0 < nx - 1) & (y0 >= 0) & (y0 < ny - 1)
    x0c = jnp.clip(x0, 0, nx - 2)
    y0c = jnp.clip(y0, 0, ny - 2)
    fx = xf - x0c
    fy = yf - y0c
    w = ((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy)
    g = (ge[y0c, x0c], ge[y0c, x0c + 1], ge[y0c + 1, x0c],
         ge[y0c + 1, x0c + 1])
    v = (image[y0c, x0c], image[y0c, x0c + 1], image[y0c + 1, x0c],
         image[y0c + 1, x0c + 1])
    norm = sum(wi * gi for wi, gi in zip(w, g))
    norm = jnp.where(norm > 0, norm, 1.0)
    out = sum(wi * gi * vi for wi, gi, vi in zip(w, g, v)) / norm
    return jnp.where(inb, out, 0.0), inb


def _stripe_forward(p, ny, nx, amp_cols):
    """Stripe image of one SCA's parameter vector (imdestripe.forward_par)."""
    img = jnp.broadcast_to(p[:ny, None], (ny, nx))
    if amp_cols:
        nblk = nx // amp_cols
        cols = jnp.repeat(p[ny:ny + nblk], amp_cols,
                          total_repeat_length=nblk * amp_cols)
        img = img + jnp.concatenate(
            [cols, jnp.zeros(nx - nblk * amp_cols, p.dtype)])[None, :]
    return img


def _penalty(r, model: str, hub: float):
    if model in (None, "quadratic"):
        return 0.5 * r * r
    if model == "absolute":
        return jnp.abs(r)
    if model == "huber_loss":
        a = jnp.abs(r)
        return jnp.where(a <= hub, 0.5 * r * r, hub * (a - 0.5 * hub))
    raise ValueError(f"unknown cost model {model!r}")


class DeviceDestripe:
    """
    Compiled cost/gradient evaluator for :class:`~pyimcom_tpu.imdestripe.
    DestripeProblem`-shaped data.

    Parameters
    ----------
    imgs : (S, ny, nx) original SCA images.
    g_eff : (S, ny, nx) effective gain maps.
    masks : (S, ny, nx) bool (True = use pixel) or None.
    pairs : list of ordered (i, j) -- SCA j interpolates onto SCA i's grid.
    xf, yf : (P, ny*nx) positions of SCA i's pixels in SCA j's frame.
    amp_cols, cost_model, hub, col_boundary_const : as in DestripeProblem.
    """

    def __init__(self, imgs, g_eff, masks, pairs, xf, yf, amp_cols=None,
                 cost_model="quadratic", hub=1.0, col_boundary_const=0.0,
                 chunk_width=50, chunk_height=100, bmasks=None):
        S, ny, nx = imgs.shape
        self.S, self.ny, self.nx = S, ny, nx
        self.amp_cols = amp_cols
        self.np_each = ny + (nx // amp_cols if amp_cols else 0)
        dt = imgs.dtype
        self._imgs = jnp.asarray(imgs)
        self._ge = jnp.asarray(g_eff)
        self._mask = (jnp.asarray(masks) if masks is not None
                      else jnp.ones((S, ny, nx), bool))
        self._pi = jnp.asarray([p[0] for p in pairs], jnp.int32)
        self._pj = jnp.asarray([p[1] for p in pairs], jnp.int32)
        self._xf = jnp.asarray(np.asarray(xf).reshape(len(pairs), -1),
                               dtype=dt)
        self._yf = jnp.asarray(np.asarray(yf).reshape(len(pairs), -1),
                               dtype=dt)
        # amplifier-boundary chunks with nonempty masks on both sides are
        # data-independent across CG iterations: resolve them on host so
        # the traced cost has no data-dependent control flow.  The penalty
        # masks follow the host convention (DestripeProblem.cost: explicit
        # problem mask, else the per-SCA object mask).
        self._bchunks = []
        if amp_cols and col_boundary_const > 0:
            if bmasks is None:
                bmasks = masks
            bm_np = [None if m is None else np.asarray(m) for m in bmasks] \
                if bmasks is not None else [None] * S
            self._bmask = jnp.stack(
                [jnp.ones((ny, nx), bool) if m is None else jnp.asarray(m)
                 for m in bm_np])
            for i in sorted({p[0] for p in pairs}):
                mi = bm_np[i] if bm_np[i] is not None \
                    else np.ones((ny, nx), bool)
                for b in range(1, nx // amp_cols):
                    lo = max(b * amp_cols - chunk_width, 0)
                    hi = min(b * amp_cols + chunk_width, nx)
                    for c0 in range(0, ny, 4 * chunk_height):
                        c1 = min(c0 + chunk_height, ny)
                        lm = mi[c0:c1, lo:b * amp_cols]
                        rm = mi[c0:c1, b * amp_cols:hi]
                        if lm.any() and rm.any():
                            self._bchunks.append(
                                (i, c0, c1, lo, b * amp_cols, hi,
                                 float(lm.sum()), float(rm.sum())))
        self._cost_model = cost_model
        self._hub = float(hub)
        self._cbc = float(col_boundary_const)
        # the big arrays enter the compiled program as OPERANDS, not
        # closure constants (closure capture bakes the survey's images into
        # the executable: multi-GiB programs that cannot even be cached)
        self._data = dict(imgs=self._imgs, ge=self._ge, mask=self._mask,
                          pi=self._pi, pj=self._pj, xf=self._xf, yf=self._yf)
        if getattr(self, "_bmask", None) is not None:
            self._data["bmask"] = self._bmask
        self._vg = jax.jit(jax.value_and_grad(self._cost))
        self._c = jax.jit(self._cost)

    # ---- the differentiable cost ---------------------------------------
    def _cost(self, params, data):
        S, ny, nx = self.S, self.ny, self.nx
        ps = params.reshape(S, self.np_each)
        stripes = jax.vmap(
            lambda p: _stripe_forward(p, ny, nx, self.amp_cols))(ps)
        imgs = data["imgs"] - stripes

        acc0 = jnp.zeros((S, ny * nx), imgs.dtype)
        cnt0 = jnp.zeros((S, ny * nx), imgs.dtype)

        @jax.checkpoint
        def step(carry, inp):
            acc, cnt = carry
            pi, pj, xf, yf = inp
            img_j = jnp.take(imgs, pj, axis=0)
            ge_j = jnp.take(data["ge"], pj, axis=0)
            interp, inb = _gather_weighted(img_j, ge_j, xf, yf)
            acc = acc.at[pi].add(interp)
            cnt = cnt.at[pi].add(inb.astype(cnt.dtype))
            return (acc, cnt), None

        (acc, cnt), _ = jax.lax.scan(
            step, (acc0, cnt0),
            (data["pi"], data["pj"], data["xf"], data["yf"]))
        acc = acc.reshape(S, ny, nx)
        cnt = cnt.reshape(S, ny, nx)
        valid = cnt > 0
        J = acc / jnp.where(valid, cnt, 1.0)
        r = jnp.where(valid & data["mask"], imgs - J, 0.0)
        eps = jnp.sum(_penalty(r, self._cost_model, self._hub))

        for (i, c0, c1, lo, mid, hi, nl, nr) in self._bchunks:
            lm = data["bmask"][i, c0:c1, lo:mid]
            rm = data["bmask"][i, c0:c1, mid:hi]
            lmean = jnp.sum(jnp.where(lm, imgs[i, c0:c1, lo:mid], 0.0)) / nl
            rmean = jnp.sum(jnp.where(rm, imgs[i, c0:c1, mid:hi], 0.0)) / nr
            eps = eps + self._cbc * (lmean - rmean) ** 2
        return eps

    # ---- public API ------------------------------------------------------
    def cost(self, params) -> float:
        return float(self._c(jnp.asarray(params), self._data))

    def cost_and_grad(self, params):
        v, g = self._vg(jnp.asarray(params), self._data)
        return float(v), np.asarray(g)
