"""HEALPix (RING) self-consistency tests."""

import numpy as np
import pytest

from pyimcom_tpu.sphere import ang2pix_ring, healpix_patch, nside2npix, pix2ang_ring


@pytest.mark.parametrize("nside", [1, 2, 16, 1024, 16384])
def test_pix2ang_ang2pix_roundtrip(nside):
    rng = np.random.default_rng(0)
    p = rng.integers(0, nside2npix(nside), size=3000)
    th, ph = pix2ang_ring(nside, p)
    np.testing.assert_array_equal(ang2pix_ring(nside, th, ph), p)


@pytest.mark.parametrize("nside", [4, 256])
def test_ang2pix_assigns_nearby_center(nside):
    rng = np.random.default_rng(1)
    th = np.arccos(rng.uniform(-1, 1, 2000))
    ph = rng.uniform(0, 2 * np.pi, 2000)
    p = ang2pix_ring(nside, th, ph)
    tc, pc = pix2ang_ring(nside, p)
    d = np.arccos(np.clip(np.cos(th) * np.cos(tc)
                          + np.sin(th) * np.sin(tc) * np.cos(ph - pc), -1, 1))
    # every point's assigned pixel center is within ~a pixel diagonal
    assert d.max() < 1.2 * np.sqrt(np.pi / 3) / nside


def test_total_pixel_count():
    # sum of ring lengths equals 12 nside^2
    nside = 8
    th, ph = pix2ang_ring(nside, np.arange(nside2npix(nside)))
    assert len(np.unique(np.round(np.cos(th), 12))) == 4 * nside - 1  # ring count


def test_patch_selection():
    patch = healpix_patch(10, ra=1.0, dec=-0.3, radius=0.01)
    assert patch["npix"] > 0
    mu = (np.sin(patch["decpix"]) * np.sin(-0.3)
          + np.cos(patch["decpix"]) * np.cos(-0.3) * np.cos(1.0 - patch["rapix"]))
    assert np.all(mu >= np.cos(0.01))
    # density check: expected ~ area/pixarea
    area = 2 * np.pi * (1 - np.cos(0.01))
    expect = area / (4 * np.pi / nside2npix(2 ** 10))
    assert 0.8 * expect < patch["npix"] < 1.2 * expect
