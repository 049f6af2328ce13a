"""
Full production-pipeline e2e: the writejob stage order
(reference scripts/writejob_example.pl:66-120, tests/pyimcom/
test_allpsfsplit.py) driven end to end on one synthetic survey:

    destripe -> layers -> splitpsf -> coadd(iter 0) -> imsubtract ->
    update -> coadd(iter 1) -> compress -> report

Asserts stripe recovery feeds the coadd, the iteration-1 block does not
degrade versus iteration 0, the compressed blocks round-trip, and the
final validation report builds with machine-readable datablocks.
"""

import glob
import json
import os
import re
import shutil

import numpy as np
import pytest

from survey_fixture import SC, SDEC, SIG_OUT, SRA, build_survey

from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block
from pyimcom_tpu.fitsio import HDUList, Header, ImageHDU, fits_read, fits_write

pytestmark = pytest.mark.slow


def _star_var(path):
    """(SL1, VAR) of the science star against the analytic target."""
    from pyimcom_tpu.wcsutil import WCS

    f = fits_read(path)
    w = WCS.from_header(f[0].header)
    xs, ys = w.world2pix(SRA, SDEC)
    d = np.asarray(f[0].data[0, 0], np.float64)
    ny, nx = d.shape
    x, y = np.meshgrid(np.arange(nx), np.arange(ny))
    p = np.exp(-0.5 * ((x - float(xs)) ** 2 + (y - float(ys)) ** 2)
               / SIG_OUT ** 2) / (2 * np.pi * SIG_OUT ** 2 * SC)
    SL1 = np.sum(p * d) / np.sum(p ** 2)
    VAR = np.sum((d - SL1 * p) ** 2) / np.sum(p ** 2)
    return SL1, VAR


def test_writejob_stage_order(tmp_path, monkeypatch):
    monkeypatch.setenv("PYIMCOM_DEVICE_ASSEMBLY", "0")
    monkeypatch.setenv("PYIMCOM_DESTRIPE_MAP_DTYPE", "f32")
    monkeypatch.setenv("PYIMCOM_DESTRIPE_MEMMAP", "1")
    cfg_dict = build_survey(tmp_path, n_obs=6, extrainput=["cstar14"],
                            config_overrides={"NPIXPSF": 16, "INPAD": 0.4})

    # ---- inject detector row stripes into the raw exposures -------------
    rng = np.random.default_rng(99)
    raw = sorted(p for p in glob.glob(str(tmp_path / "in" / "sim_L2_*.fits"))
                 if "_mask" not in p)
    assert len(raw) >= 3
    clean = {}
    for p in raw:
        f = fits_read(p)
        img = np.asarray(f[0].data, np.float64)
        clean[p] = img.copy()
        stripes = rng.normal(scale=0.01, size=img.shape[0])
        fits_write(p, HDUList([ImageHDU(
            (img + stripes[:, None]).astype(np.float32),
            header=Header(f[0].header))]))

    # ---- stage 1: destripe (device-resident cost/gradient) ---------------
    monkeypatch.setenv("PYIMCOM_DESTRIPE_DEVICE", "1")
    from pyimcom_tpu import imdestripe

    dsdir = str(tmp_path / "ds")
    d = dict(cfg_dict)
    d["DSOUT"] = [dsdir, "ds"]
    d["DSOBSFILE"] = str(tmp_path / "in" / "sim_L2_*[0-9].fits")
    cfgfile = str(tmp_path / "cfg_pipe.json")
    with open(cfgfile, "w") as f:
        json.dump(d, f)
    imdestripe.main(Config(cfgfile), maxiter=5, add_objmask=False,
                    use_wcs_gain=False)
    assert os.path.exists(os.path.join(dsdir, "cg_log.csv"))
    monkeypatch.delenv("PYIMCOM_DESTRIPE_DEVICE")

    # destriping must beat the injected stripes; feed the destriped images
    # back under the original L2 names (the production envelope's layer
    # stage consumes the destriped exposures)
    pat = re.compile(r"(\w\d+)_(\d+)_(\d+)")
    improved = 0
    for p in raw:
        name = pat.search(os.path.basename(p)).group(0)
        dsf = os.path.join(dsdir, f"ds_{name}.fits")
        assert os.path.exists(dsf), dsf
        g = fits_read(dsf)
        ds = np.asarray(g[0].data, np.float64)
        before = np.std(np.median(
            np.asarray(fits_read(p)[0].data, np.float64) - clean[p], axis=1))
        after = np.std(np.median(ds - clean[p], axis=1))
        if after < 0.5 * before:
            improved += 1
        fits_write(p, HDUList([ImageHDU(ds.astype(np.float32),
                                        header=Header(g[0].header))]))
    # stripe DIFFERENCES are the observable (gauge freedom leaves a common
    # row mode); at least half the exposures must clean up decisively
    assert improved >= len(raw) // 2, improved

    # ---- stage 2+3: psf split + input layers ------------------------------
    from pyimcom_tpu.layer_wrapper import build_all_layers
    from pyimcom_tpu.splitpsf import splitpsf

    cache = str(tmp_path / "cache" / "in")
    d["PSFSPLIT"] = [3.0, 6.0, 0.01]
    d["STOP"] = 1
    with open(cfgfile, "w") as f:
        json.dump(d, f)
    count = splitpsf.main(cfgfile)
    assert count >= 3
    built = build_all_layers(Config(cfgfile))
    assert built

    # ---- stage 4: coadd iteration 0 --------------------------------------
    # (STOP=1 above only bounds the splitpsf/layer smoke stages; the coadds
    # must fill the whole block or the science star's stamp is never solved)
    d0 = dict(d)
    d0["STOP"] = 0
    d0["OUT"] = d["OUT"] + "_it0"
    Block(cfg=Config(d0), this_sub=1)
    out0 = d0["OUT"] + "_00_01.fits"
    assert fits_read(out0)["OLDCFG"].header["IMSBITER"] == 0

    # ---- stage 5: wing subtraction ----------------------------------------
    from pyimcom_tpu.splitpsf import imsubtract

    cfg0 = Config(d0)
    cfg0.outstem = d0["OUT"]
    spat = re.compile(r"_(\d{8})_(\d{2})\.fits$")
    scas = sorted({int(spat.search(p).group(2))
                   for p in glob.glob(cache + "_*_*.fits") if spat.search(p)})
    wrote = []
    for sca in scas:
        wrote += imsubtract.main(cfg0, sca)
    assert wrote

    # ---- stage 6: update the layer cache to iteration 1 -------------------
    from pyimcom_tpu.splitpsf.update_cube import get_iteration, update

    assert update(Config(cfgfile)) == 1
    assert get_iteration(cache) == 1

    # ---- stage 7: coadd iteration 1 ---------------------------------------
    d1 = dict(d)
    d1["STOP"] = 0
    d1["OUT"] = d["OUT"] + "_it1"
    Block(cfg=Config(d1), this_sub=1)
    out1 = d1["OUT"] + "_00_01.fits"
    assert fits_read(out1)["OLDCFG"].header["IMSBITER"] == 1

    sl0, var0 = _star_var(out0)
    sl1, var1 = _star_var(out1)
    print("iter0:", sl0, var0, " iter1:", sl1, var1)
    # iteration 1 (wing-subtracted inputs + long-range kernel restored)
    # must not degrade the star reconstruction
    assert abs(sl1 - 1) < 5e-3
    assert var1 < max(var0 * 1.05, 1e-5)

    # ---- stage 8: compress -------------------------------------------------
    from pyimcom_tpu.layer_wrapper import compress_all_blocks

    outs = compress_all_blocks(Config(d1))
    assert outs
    from pyimcom_tpu.compress.compressutils import ReadFile

    with ReadFile(outs[0]) as fc:
        assert fc[0].data is not None

    # ---- stage 9: validation report ----------------------------------------
    from pyimcom_tpu.diagnostics.report import pull_from_file
    from pyimcom_tpu.diagnostics.run import run_report

    repstem = str(tmp_path / "rep")
    pdf = run_report(out1, repstem, ds_dir=dsdir,
                     ds_pattern=r"ds_\w+?_(\d+)_(\d+)\.fits$")
    assert os.path.exists(pdf)
    blocks = pull_from_file(repstem + "_data.txt")
    assert blocks, "report emitted no machine-readable datablocks"
