"""
Full PSF-splitting iteration loop, end to end (reference
tests/pyimcom/test_allpsfsplit.py flow, without its web downloads):

    splitpsf.main -> Block (iteration 0, short-range PSFs) ->
    imsubtract.main (wing subtraction from the coadd) ->
    update_cube.update -> Block (iteration 1) with the OLDCFG HDU.
"""

import json

import numpy as np
import pytest

from survey_fixture import build_survey

from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block
from pyimcom_tpu.fitsio import fits_read


@pytest.mark.slow
def test_full_psfsplit_iteration(tmp_path, monkeypatch):
    monkeypatch.setenv("PYIMCOM_DEVICE_ASSEMBLY", "0")
    cfg_dict = build_survey(tmp_path, n_obs=8, extrainput=["cstar14"],
                            config_overrides={"NPIXPSF": 16, "INPAD": 0.4})
    cache = str(tmp_path / "cache" / "in")
    d = dict(cfg_dict)
    d["INLAYERCACHE"] = cache
    d["PSFSPLIT"] = [3.0, 6.0, 0.01]
    d["STOP"] = 1
    cfgfile = str(tmp_path / "cfg_split.json")
    with open(cfgfile, "w") as f:
        json.dump(d, f)

    # --- stage 0: split every in-filter observation's PSF ----------------
    from pyimcom_tpu.splitpsf import splitpsf

    count = splitpsf.main(cfgfile)
    assert count >= 4  # the in-filter observations
    sf = fits_read(cache + f".psf/psf_{0:d}.fits")
    nsca = int(sf[0].header["NSCA"])
    assert sf[0].header["GSSKIP"] == nsca
    assert sf[0].header["KERSKIP"] == 2 * nsca

    # --- stage 1: iteration-0 coadd with the short-range PSF -------------
    d0 = dict(d)
    d0["OUT"] = d["OUT"] + "_it0"
    Block(cfg=Config(d0), this_sub=1)
    out0 = fits_read(d0["OUT"] + "_00_01.fits")
    # psfsplit blocks carry the iteration-history HDU (reference
    # coadd.py:2308-2325)
    assert out0["OLDCFG"].header["IMSBITER"] == 0

    # --- stage 2: wing subtraction per SCA --------------------------------
    from pyimcom_tpu.splitpsf import imsubtract

    cfg0 = Config(d0)
    cfg0.outstem = d0["OUT"]   # blocks written under the it0 stem
    wrote = []
    import glob
    import re

    pat = re.compile(r"_(\d{8})_(\d{2})\.fits$")
    scas = sorted({int(pat.search(p).group(2))
                   for p in glob.glob(cache + "_*_*.fits") if pat.search(p)})
    assert scas, "iteration-0 run must have populated the input-layer cache"
    for sca in scas:
        wrote += imsubtract.main(cfg0, sca)
    assert wrote, "wing subtraction produced no _subI files"
    sub = fits_read(wrote[0])
    orig = fits_read(wrote[0].replace("_subI", ""))
    a = np.asarray(orig[0].data, np.float64)
    b = np.asarray(sub[0].data, np.float64)
    assert a.shape == b.shape
    diff = np.abs(a - b)
    assert diff.max() > 0, "subtraction changed nothing"
    # wings are a small correction, not a rewrite of the image
    assert np.median(diff[np.isfinite(diff)]) < 0.5 * np.abs(a).max()

    # --- stage 3: swap the cache, advance the iteration ------------------
    from pyimcom_tpu.splitpsf.update_cube import get_iteration, update

    it = update(Config(cfgfile))
    assert it == 1 and get_iteration(cache) == 1

    # --- stage 4: iteration-1 coadd ---------------------------------------
    d1 = dict(d)
    d1["OUT"] = d["OUT"] + "_it1"
    Block(cfg=Config(d1), this_sub=1)
    out1 = fits_read(d1["OUT"] + "_00_01.fits")
    assert out1["OLDCFG"].header["IMSBITER"] == 1
    # the recorded history holds the iteration-0 config
    hist = json.loads("".join(str(r) for r in out1["OLDCFG"].data["text"]))
    assert hist[0]["iteration"] == 0

    # both iterations produce finite science maps
    for out in (out0, out1):
        sci = np.asarray(out[0].data, np.float64)
        assert np.all(np.isfinite(sci))
