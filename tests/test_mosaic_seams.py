"""
Mosaic seam test: coadd ALL FOUR blocks of the 2x2 mosaic with postage
padding, run Mosaic.share_padding_stamps, and check that adjacent blocks
agree on their shared sky (the reference exercises this via the 4-block
flow of tests/pyimcom/test_pyimcom.py and analysis.py:1429-1467).
"""

import numpy as np
import pytest

from survey_fixture import build_survey

from pyimcom_tpu.analysis import Mosaic
from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block


@pytest.mark.slow
def test_four_block_mosaic_halo_exchange(tmp_path, monkeypatch):
    monkeypatch.setenv("PYIMCOM_DEVICE_ASSEMBLY", "0")
    cfg_dict = build_survey(tmp_path, n_obs=6, extrainput=["whitenoise1"],
                            config_overrides={
                                "NPIXPSF": 12, "INPAD": 0.25,
                                "OUTSIZE": [2, 16, 0.04],
                                "PAD": 2, "PADSIDES": "auto"})
    cfg_dict["STOP"] = 0
    for sub in range(4):
        Block(cfg=Config(cfg_dict), this_sub=sub)

    mos = Mosaic(cfg_dict["OUT"])
    assert mos.nblock == 2
    cfg = mos.cfg
    w = cfg.postage_pad * cfg.n2
    NsideP, Nside = cfg.NsideP, cfg.Nside

    # compare the coadded white-noise layer: nonzero at every covered pixel,
    # so seam agreement is a meaningful test everywhere
    LYR = 1
    a_before = np.array(mos[0, 0].load()[0].data[0, LYR], np.float64)
    assert np.any(a_before != 0), "mosaic produced an empty noise layer"

    mos.share_padding_stamps()

    A = np.array(mos[0, 0].load()[0].data[0, LYR], np.float64)   # left block
    B = np.array(mos[1, 0].load()[0].data[0, LYR], np.float64)   # right block
    C = np.array(mos[0, 1].load()[0].data[0, LYR], np.float64)   # top neighbor

    # with PADSIDES='auto' (the reference's supported mode,
    # analysis.py:426-428) interior-facing pads start EMPTY and the
    # exchange fills them with the neighbor's computed interior
    fk = cfg.fade_kernel
    assert np.all(a_before[:, NsideP - w + fk:] == 0), \
        "auto mode: interior pad must start empty"
    assert not np.allclose(A[:, NsideP - w:], a_before[:, NsideP - w:])

    # same-sky agreement after the exchange: A's filled pad columns (beyond
    # the fk blend band) carry exactly B's interior values
    # avoid the corner regions and the fk-wide blend bands at the
    # perpendicular padding edges (their mixing is order-dependent, as in
    # the reference's sequential exchange)
    core = np.s_[w + fk:NsideP - w - fk]
    for c in range(NsideP - w + fk, NsideP):
        ca = A[core, c]
        cb = B[core, c - Nside]
        scale = max(np.abs(cb).max(), 1e-12)
        np.testing.assert_allclose(ca, cb, rtol=0, atol=1e-6 * scale,
                                   err_msg=f"x-seam mismatch at column {c}")
        assert np.any(cb != 0)

    # vertical seam: A's filled top pad equals C's interior rows
    for r in range(NsideP - w + fk, NsideP):
        ra = A[r, core]
        rc = C[r - Nside, core]
        scale = max(np.abs(rc).max(), 1e-12)
        np.testing.assert_allclose(ra, rc, rtol=0, atol=1e-6 * scale,
                                   err_msg=f"y-seam mismatch at row {r}")

    # INWEIGHT merging: A's right padding stamps carry B's (better-covered)
    # weights for the shared exposures
    iwA = np.array(mos[0, 0].load()["INWEIGHT"].data)
    iwB = np.array(mos[1, 0].load()["INWEIGHT"].data)
    idsA = list(zip(mos[0, 0].load()["INDATA"]["obsid"],
                    mos[0, 0].load()["INDATA"]["sca"]))
    idsB = list(zip(mos[1, 0].load()["INDATA"]["obsid"],
                    mos[1, 0].load()["INDATA"]["sca"]))
    shared = set(idsA) & set(idsB)
    assert shared
    n1P, pad = cfg.n1P, cfg.postage_pad
    rows = np.s_[pad:n1P - pad]   # corner pad stamps mix two neighbors
    for idsca in shared:
        mi, ui = idsA.index(idsca), idsB.index(idsca)
        np.testing.assert_allclose(
            iwA[:, mi, rows, n1P - pad:], iwB[:, ui, rows, pad:2 * pad],
            rtol=0, atol=1e-7)
