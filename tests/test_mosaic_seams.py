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
    cfg_dict = build_survey(tmp_path, n_obs=6, extrainput=["cstar14"],
                            config_overrides={
                                "NPIXPSF": 12, "INPAD": 0.25,
                                "OUTSIZE": [2, 16, 0.04],
                                "PAD": 1, "PADSIDES": "all"})
    cfg_dict["STOP"] = 0
    for sub in range(4):
        Block(cfg=Config(cfg_dict), this_sub=sub)

    mos = Mosaic(cfg_dict["OUT"])
    assert mos.nblock == 2
    cfg = mos.cfg
    w = cfg.postage_pad * cfg.n2
    NsideP, Nside = cfg.NsideP, cfg.Nside

    # pre-exchange: padding strips are trapezoid-faded partial coadds
    a_before = np.array(mos[0, 0].load()[0].data[0, 0], np.float64)

    mos.share_padding_stamps()

    A = np.array(mos[0, 0].load()[0].data[0, 0], np.float64)   # left block
    B = np.array(mos[1, 0].load()[0].data[0, 0], np.float64)   # right block
    C = np.array(mos[0, 1].load()[0].data[0, 0], np.float64)   # top neighbor

    # the exchange changed the padding strip
    assert not np.allclose(A[:, NsideP - w:], a_before[:, NsideP - w:])

    # same-sky agreement after the exchange: column c of A equals column
    # c - Nside of B over the 2w-wide overlap (both carry the sum of both
    # blocks' faded contributions)
    core = np.s_[w:NsideP - w]  # avoid the corner regions (both axes padded)
    for c in range(NsideP - 2 * w, NsideP):
        ca = A[core, c]
        cb = B[core, c - Nside]
        scale = max(np.abs(ca).max(), 1e-12)
        np.testing.assert_allclose(ca, cb, rtol=0, atol=1e-5 * scale,
                                   err_msg=f"x-seam mismatch at column {c}")

    # vertical seam: row r of A equals row r - Nside of C
    for r in range(NsideP - 2 * w, NsideP):
        ra = A[r, core]
        rc = C[r - Nside, core]
        scale = max(np.abs(ra).max(), 1e-12)
        np.testing.assert_allclose(ra, rc, rtol=0, atol=1e-5 * scale,
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
    for idsca in shared:
        mi, ui = idsA.index(idsca), idsB.index(idsca)
        np.testing.assert_allclose(
            iwA[:, mi, :, n1P - pad:], iwB[:, ui, :, pad:2 * pad],
            rtol=0, atol=1e-7)
