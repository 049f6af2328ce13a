"""Truth-catalog tests: grid positions, orientation angles, and the
regenerated per-object morphology/amplitude columns (reference
truthcats.py:29-390)."""

import numpy as np

from pyimcom_tpu.config import Config
from pyimcom_tpu.truthcats import block_truth_positions, layer_truth_columns

CFG = {"OBSFILE": "obs.fits", "INDATA": ["/tmp", "L2_fits"], "FILTER": 1,
       "INPSF": ["/tmp", "L2_fits", 8], "CTR": [60.0, -3.8], "BLOCK": 2,
       "OUTSIZE": [4, 25, 0.04], "OUT": "/tmp/x"}


def test_block_truth_positions_orientation():
    cfg = Config(CFG)
    cfg()
    # res 17 grid (~1.6 arcsec spacing) guarantees sources inside the
    # 4 arcsec test block
    pos = block_truth_positions(cfg, 0, 1, 17)
    n = len(pos["ipix"])
    assert n > 0
    # positions inside the block
    assert np.all((pos["x"] > -0.5) & (pos["x"] < cfg.NsideP - 0.5))
    # orientation: the output STG projection is nearly north-up, so pa ~ 0
    # or ~360 (mod 360), within the projection's small rotation
    pa = pos["pa"]
    assert np.all((pa < 5) | (pa > 355))
    # round-trip: pixel -> world matches the catalog ra/dec
    from pyimcom_tpu.wcsutil import make_block_wcs

    w = make_block_wcs(cfg, 0, 1)
    ra, dec = w.pix2world(pos["x"], pos["y"])
    np.testing.assert_allclose(ra, pos["ra"], atol=1e-10)


def test_layer_truth_columns_gsext_morphology():
    ipix = np.array([101, 202, 303], dtype=np.int64)
    cols = layer_truth_columns("gsext14,n=1,hlr=0.3,shape=0.1:-0.05,seed=777",
                               ipix)
    assert set(cols) >= {"sersic_n", "hlr", "g1", "g2"}
    np.testing.assert_allclose(cols["sersic_n"], 1.0)
    np.testing.assert_allclose(cols["g1"], 0.1)
    np.testing.assert_allclose(cols["g2"], -0.05)
    # per-object hlr regenerates the injector's RNG subsequence exactly
    for k, ip in enumerate(ipix):
        sub = np.random.default_rng([777, int(ip)])
        assert abs(cols["hlr"][k] - 0.3 * (0.8 + 0.4 * sub.uniform())) < 1e-14
    # distinct objects get distinct radii
    assert len(np.unique(cols["hlr"])) == 3
    # without a seed the radius is constant
    cols2 = layer_truth_columns("gsext14,n=1,hlr=0.3", ipix)
    np.testing.assert_allclose(cols2["hlr"], 0.3)


def test_layer_truth_columns_nstar_amplitude():
    cols = layer_truth_columns("nstar14,2e5,100,256", np.arange(5))
    np.testing.assert_allclose(cols["amp"], 2e5)
    assert layer_truth_columns("cstar14", np.arange(3)) == {}
