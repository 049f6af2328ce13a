"""PSF group / overlap / submatrix unit tests, incl. dense-vs-gather parity."""

import jax.numpy as jnp
import numpy as np
import pytest

import pyimcom_tpu.psfgrp as psfgrp
from pyimcom_tpu.ops.fourier import overlap_from_rft, pad_and_rfft2
from pyimcom_tpu.ops.psfmodels import psf_gaussian
from pyimcom_tpu.psfgrp import (
    PSFGeometry,
    PSFGroup,
    build_overlap_stack,
    interp_io_submatrix,
    interp_submatrix,
    outpsf_C_values,
)


@pytest.fixture(scope="module")
def geometry():
    return PSFGeometry(npixpsf=16, oversamp=4, dtheta=0.04 / 3600)


@pytest.fixture(scope="module")
def groups(geometry):
    geom = geometry
    rng = np.random.default_rng(0)
    psfs1 = np.stack([psf_gaussian(geom.nsamp, 5.0 + i, 5.0 + i) for i in range(3)])
    psfs2 = np.stack([psf_gaussian(geom.nsamp, 6.0, 6.0)])
    g1 = PSFGroup(geom, psfs1, idx_blk2grp=np.arange(3), idx_grp2blk=np.arange(3))
    g2 = PSFGroup(geom, psfs2)
    return g1, g2


def test_gaussian_overlap_C(geometry):
    """Zero-lag Gaussian self-overlap matches the analytic integral."""
    geom = geometry
    sig = 6.0
    grp = PSFGroup(geom, psf_gaussian(geom.nsamp, sig, sig)[None])
    C = outpsf_C_values(geom, grp)
    np.testing.assert_allclose(C[0], 1.0 / (4 * np.pi * sig ** 2), rtol=1e-5)


def test_overlap_stack_symmetry(geometry, groups):
    geom = geometry
    g1, _ = groups
    stack = build_overlap_stack(geom, g1, None)
    s = np.asarray(stack).reshape(3, 3, *stack.shape[-2:])
    # overlap(i, j) is the 180-degree rotation of overlap(j, i)
    p = psfgrp.INTERP_PAD
    a = s[0, 1, p:-p, p:-p]
    b = s[1, 0, p:-p, p:-p]
    np.testing.assert_allclose(a, b[::-1, ::-1], atol=1e-12)


def _fake_stamp(rng, n, n_img, span):
    x = rng.uniform(-span, span, n)
    img = np.sort(rng.integers(0, n_img, n))
    order = np.argsort(img, kind="stable")
    return np.sort(x)[order * 0 + np.arange(n)], rng.uniform(-span, span, n), img


def test_dense_matches_gather_submatrix(geometry, groups, monkeypatch):
    geom = geometry
    g1, g2 = groups
    stack = build_overlap_stack(geom, g1, None)
    rng = np.random.default_rng(3)
    n1, n2 = 37, 29
    x1 = rng.uniform(-8, 8, n1)
    y1 = rng.uniform(-8, 8, n1)
    i1 = np.sort(rng.integers(0, 3, n1)).astype(np.int64)
    x2 = rng.uniform(-8, 8, n2)
    y2 = rng.uniform(-8, 8, n2)
    i2 = np.sort(rng.integers(0, 3, n2)).astype(np.int64)
    b2g = np.arange(3)

    monkeypatch.setattr(psfgrp, "_use_dense", lambda: False)
    res_g = interp_submatrix(geom, stack, x1, y1, i1, x2, y2, i2, b2g, b2g, 3,
                             1e-7, 3.0)
    monkeypatch.setattr(psfgrp, "_use_dense", lambda: True)
    res_d = interp_submatrix(geom, stack, x1, y1, i1, x2, y2, i2, b2g, b2g, 3,
                             1e-7, 3.0)
    np.testing.assert_allclose(res_d, res_g, rtol=0, atol=1e-12)


def test_dense_matches_gather_io(geometry, groups, monkeypatch):
    geom = geometry
    g1, g2 = groups
    stack = build_overlap_stack(geom, g1, g2)
    rng = np.random.default_rng(4)
    n1 = 41
    x1 = rng.uniform(-8, 8, n1)
    y1 = rng.uniform(-8, 8, n1)
    i1 = np.sort(rng.integers(0, 3, n1)).astype(np.int64)
    out_x = np.arange(-3.0, 4.0)
    out_y = np.arange(-3.0, 4.0)
    ox, oy = np.meshgrid(out_x, out_y)
    b2g = np.arange(3)

    monkeypatch.setattr(psfgrp, "_use_dense", lambda: False)
    res_g = interp_io_submatrix(geom, stack, x1, y1, i1, b2g,
                                ox.ravel(), oy.ravel(), 1)
    monkeypatch.setattr(psfgrp, "_use_dense", lambda: True)
    res_d = interp_io_submatrix(geom, stack, x1, y1, i1, b2g,
                                ox.ravel(), oy.ravel(), 1)
    np.testing.assert_allclose(res_d, res_g, rtol=0, atol=1e-12)


def test_overlap_interpolates_to_analytic(geometry):
    """Interpolated Gaussian-Gaussian overlap values match the closed form."""
    geom = geometry
    sig = 5.0  # samples
    grp = PSFGroup(geom, psf_gaussian(geom.nsamp, sig, sig)[None],
                   idx_blk2grp=np.zeros(1, dtype=int), idx_grp2blk=np.zeros(1, dtype=int))
    stack = build_overlap_stack(geom, grp, None)
    rng = np.random.default_rng(5)
    n = 50
    # positions in output pixels; separations within a few samples
    x = rng.uniform(-3, 3, n)
    y = rng.uniform(-3, 3, n)
    img = np.zeros(n, dtype=np.int64)
    res = interp_submatrix(geom, stack, x, y, img, x, y, img,
                           np.zeros(1, dtype=int), np.zeros(1, dtype=int), 1,
                           0.0, 1.0)
    d2 = ((x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2) \
        / geom.dscale ** 2  # in samples^2
    want = np.exp(-d2 / (4 * sig ** 2)) / (4 * np.pi * sig ** 2)
    np.testing.assert_allclose(res, want, rtol=0, atol=3e-7)


def test_sample_psf_rotated_batch_matches_single():
    from pyimcom_tpu.psfgrp import (PSFGeometry, sample_psf_rotated,
                                    sample_psf_rotated_batch)

    rng = np.random.default_rng(0)
    geom = PSFGeometry(npixpsf=8, oversamp=4, dtheta=0.04 / 3600)
    ny = nx = geom.nsamp + 9
    psfs = [rng.random((ny, nx)) for _ in range(3)]
    ths = [0.0, 0.1, -0.25]

    def mk(th):
        c, s = np.cos(th), np.sin(th)

        def f(xy):
            xy = np.asarray(xy, dtype=np.float64)
            return np.stack([c * xy[:, 0] - s * xy[:, 1],
                             s * xy[:, 0] + c * xy[:, 1]], axis=-1) * 0.35

        return f

    mapfns = [mk(t) for t in ths]
    batch = sample_psf_rotated_batch(geom, psfs, mapfns, [10.0, -3.0])
    host = sample_psf_rotated_batch(geom, psfs, mapfns, [10.0, -3.0],
                                    host=True)
    for g in range(3):
        single = sample_psf_rotated(geom, psfs[g], mapfns[g], [10.0, -3.0])
        np.testing.assert_allclose(batch[g], single, rtol=0, atol=1e-11)
        np.testing.assert_allclose(host[g], single, rtol=0, atol=1e-11)


def test_overlap_spectra_matches_host_fft(monkeypatch):
    """DFT-by-matmul overlap stacks == host f64 FFT stacks (ops/dftmm.py)."""
    from pyimcom_tpu import psfgrp
    from pyimcom_tpu.psfgrp import PSFGeometry, PSFGroup, build_overlap_stack, \
        outpsf_C_values

    rng = np.random.default_rng(3)
    geom = PSFGeometry(npixpsf=8, oversamp=4, dtheta=0.04 / 3600)
    psfs = rng.random((3, geom.nsamp, geom.nsamp))
    psfs /= psfs.sum(axis=(1, 2), keepdims=True)

    monkeypatch.setenv("PYIMCOM_DEVICE_OVERLAP", "0")
    monkeypatch.setattr(psfgrp, "_use_dense", lambda: True)
    g_host = PSFGroup(geom, psfs.copy(), amp_penalty=(0.1, 0.5))
    s_host = np.asarray(build_overlap_stack(geom, g_host, None))
    c_host = np.asarray(outpsf_C_values(geom, g_host))

    monkeypatch.setenv("PYIMCOM_DEVICE_OVERLAP", "1")
    g_dev = PSFGroup(geom, psfs.copy(), amp_penalty=(0.1, 0.5))
    assert isinstance(g_dev.psf_rft, tuple)
    s_dev = np.asarray(build_overlap_stack(geom, g_dev, None))
    c_dev = np.asarray(outpsf_C_values(geom, g_dev))

    np.testing.assert_allclose(s_dev, s_host, rtol=0, atol=1e-12)
    np.testing.assert_allclose(c_dev, c_host, rtol=0, atol=1e-12)
