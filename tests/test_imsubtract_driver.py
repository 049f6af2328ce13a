"""Blockwise wing-subtraction driver: Tukey stitching + convolution + resample.

A constant-surface-brightness mosaic split into 2x2 overlapping blocks must
stitch seamlessly (complementary tapers sum to one), and with a
delta-function wing kernel the subtraction removes exactly that constant
(reference imsubtract.py:265-729 behavior).
"""

import numpy as np
from types import SimpleNamespace

from pyimcom_tpu.splitpsf.imsubtract import (
    subtract_wings_blockwise,
    tukey_window_1d,
)
from pyimcom_tpu.wcsutil import WCS, make_block_wcs


def test_tukey_partition_of_unity():
    N, overlap = 30, 5
    w = tukey_window_1d(N, 2 * overlap)
    # adjacent blocks are offset by N - 2*overlap; tapers must sum to 1
    s = w[N - 2 * overlap:] + w[:2 * overlap]
    np.testing.assert_allclose(s, 1.0, atol=1e-12)


def test_blockwise_subtraction_constant_mosaic():
    cfg = SimpleNamespace(n2=5, postage_pad=1, nblock=2, Nside=20, NsideP=30,
                          ra=10.0, dec=-5.0, dtheta=0.11 / 3600.0,
                          lonpole=180.0)
    overlap = cfg.n2 * cfg.postage_pad

    bwcs = {(ix, iy): make_block_wcs(cfg, ix, iy)
            for ix in range(2) for iy in range(2)}

    def reader(ix, iy):
        return np.ones((cfg.NsideP, cfg.NsideP)), bwcs[(ix, iy)]

    # exposure: native-scale STG frame at the mosaic center (20x20 px)
    s = 0.11 / 3600.0
    ewcs = WCS(ctype=("RA---STG", "DEC--STG"), crval=(cfg.ra, cfg.dec),
               crpix=(9.5, 9.5), cd=np.diag([-s, s]), lonpole=180.0)

    # delta wing kernel: single Legendre term, unit mass at the center
    K = np.zeros((1, 5, 5))
    K[0, 2, 2] = 1.0

    cube = np.zeros((1, 20, 20), dtype=np.float32)
    out = subtract_wings_blockwise(cube, ewcs, K, oversamp=1,
                                   nblock=cfg.nblock, overlap=overlap,
                                   block_reader=reader)
    # constant mosaic * unit kernel * (native/ideal pixel-area ratio ~ 1)
    np.testing.assert_allclose(out[0], -1.0, atol=1e-3)
