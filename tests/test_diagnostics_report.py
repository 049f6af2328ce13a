"""
Mosaic-wide validation-report test: coadd all four blocks of a tiny 2x2
mosaic with two injected noise layers, then build the full report and check
the reference-style noise machinery (per-block spectra -> mosaic average ->
overview + machine-readable variances; reference
diagnostics/noise_diagnostics.py:82-151,562-633).
"""

import glob
import os

import numpy as np
import pytest

from survey_fixture import build_survey

from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mosaic_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diagmosaic")
    cfg_dict = build_survey(
        tmp, n_obs=6, extrainput=["whitenoise1", "1fnoise2"],
        config_overrides={"NPIXPSF": 12, "INPAD": 0.25,
                          "OUTSIZE": [2, 16, 0.04],
                          "PAD": 1, "PADSIDES": "all"})
    cfg_dict["STOP"] = 0
    for sub in range(4):
        Block(cfg=Config(cfg_dict), this_sub=sub)
    return tmp, cfg_dict


def test_noise_report_mosaic_average(mosaic_run):
    from pyimcom_tpu.diagnostics.report import ValidationReport
    from pyimcom_tpu.diagnostics.sections import NoiseReport
    from pyimcom_tpu.fitsio import fits_read

    tmp, cfg_dict = mosaic_run
    fname = cfg_dict["OUT"] + "_00_00.fits"
    outstem = str(tmp / "rep")
    rpt = ValidationReport(fname, outstem)
    sec = NoiseReport(rpt, tarfiles=False)
    sec.build()
    rpt.addsections([sec])
    rpt.compile()

    # all four blocks consumed
    assert "nblocks 4" in sec.datablocks["NOISEPOWER"]
    assert "LAYER00 whitenoise1" in sec.datablocks["NOISEPOWER"]
    assert "LAYER01 1fnoise2" in sec.datablocks["NOISEPOWER"]

    # per-block spectra + mosaic average on disk
    assert len(sec.psfiles) == 4
    avg = glob.glob(outstem + "_noise_*_ps_avg.fits")
    assert len(avg) == 1
    f = fits_read(avg[0])
    ps2d = np.asarray(f[0].data, dtype=np.float64)
    assert ps2d.shape[0] == 2 and ps2d.shape[1] == ps2d.shape[2]
    assert int(f[0].header["NLAYERS"]) == 2
    assert np.all(np.isfinite(ps2d)) and ps2d.max() > 0

    # averaging is exact: avg == mean of the per-block 2D spectra
    stack = np.stack([np.asarray(fits_read(p)[0].data, np.float64)
                      for p in sec.psfiles])
    np.testing.assert_allclose(ps2d, stack.mean(axis=0), rtol=1e-5)

    # P1D table: wavenumbers increase within each layer, powers positive
    tab = f["P1D_TABLE"]
    k = np.asarray(tab["Wavenumber"], dtype=np.float64)
    p = np.asarray(tab["Power"], dtype=np.float64)
    lid = np.asarray(tab["NoiseLayerID"])
    for layer in np.unique(lid):
        kl = k[lid == layer]
        assert np.all(np.diff(kl) > 0)
    assert np.all(p >= 0) and p.max() > 0

    # the machine-readable variance lines equal the average of the 2D
    # spectrum (reference noise_diagnostics.py:127-135)
    s_out = 0.04
    for il, line in enumerate(
            ln for ln in sec.datablocks["NOISEPOWER"].splitlines()
            if ln.startswith("LAYER")):
        var = float(line.split()[-1])
        np.testing.assert_allclose(var, np.average(ps2d[il]) / s_out ** 2,
                                   rtol=1e-5)

    assert os.path.exists(outstem + "_report.pdf")


def test_noise_report_tarball(mosaic_run):
    from pyimcom_tpu.diagnostics.report import ValidationReport
    from pyimcom_tpu.diagnostics.sections import NoiseReport

    tmp, cfg_dict = mosaic_run
    fname = cfg_dict["OUT"] + "_00_00.fits"
    outstem = str(tmp / "rep_tar")
    rpt = ValidationReport(fname, outstem)
    sec = NoiseReport(rpt, tarfiles=True)
    sec.build()
    tars = glob.glob(outstem + "_noise_blockps*.tar")
    assert len(tars) == 1
    # per-block files were folded into the tar and removed
    assert not any(os.path.exists(p) for p in sec.psfiles)
    import tarfile

    with tarfile.open(tars[0]) as tf:
        assert len(tf.getnames()) == 4
    # the datablock records the bundle and its contents
    blk = sec.datablocks["NOISEPOWER"]
    assert "TARFILE " + os.path.basename(tars[0]) in blk
    assert blk.count("BUNDLED ") == 4
    assert "AVGFILE " in blk


def test_full_report_all_sections(mosaic_run):
    """run_report drives every section over the mosaic without error."""
    from pyimcom_tpu.diagnostics.run import run_report

    tmp, cfg_dict = mosaic_run
    fname = cfg_dict["OUT"] + "_00_00.fits"
    outstem = str(tmp / "rep_full")
    pdf = run_report(fname, outstem)
    assert os.path.exists(pdf)
    data = outstem + "_data.txt"
    assert os.path.exists(data)
    from pyimcom_tpu.diagnostics.report import pull_from_file

    blocks = pull_from_file(data)
    assert "NOISEPOWER" in blocks


def test_blkgrp_mosaic_and_suite(mosaic_run):
    """Mosaic/Suite group analyses (reference _BlkGrp, analysis.py:1087-1392):
    coverage + consumption maps, coverage-binned noise spectra npz with
    calibrated wavenumbers, prime-hashed Suite indexing."""
    from pyimcom_tpu.analysis import Mosaic, NoiseAnal, Suite

    tmp, cfg_dict = mosaic_run
    mos = Mosaic(cfg_dict["OUT"])
    assert mos.nblock == 2

    cov = mos.get_coverage_map()
    assert cov.shape == (2, 2) and np.all(cov > 0)
    cons = mos.get_consump_map()  # no job logs in the fixture -> NaN
    assert cons.shape == (2, 2)

    ps2d, ps1d, wn = mos.get_noise_power_spectra(bins=3)
    L = mos.cfg.Nside // 8 * 8
    assert ps2d.shape == (2, L // 8, L // 8)          # both noise layers
    assert ps1d.shape == (2, 3, L // 16, 2)
    assert np.all(np.isfinite(ps2d)) and ps2d.max() > 0
    # wavenumbers calibrated to cycles/arcsec: the radial bins span up to
    # the FFT-plane corner at sqrt(2) x Nyquist = sqrt(2)/(2 * 0.04")
    nyq = 0.5 / 0.04
    assert 0 < wn[0] < wn[-1] <= np.sqrt(2) * nyq * 1.01
    assert wn[-1] > nyq * 0.7
    # persisted and reloaded identically
    assert os.path.exists(cfg_dict["OUT"] + "_NoisePS.npz")
    mos2 = Mosaic(cfg_dict["OUT"])
    p2, p1, w2 = mos2.get_noise_power_spectra()
    np.testing.assert_allclose(p2, ps2d)
    # the mosaic average equals the mean of per-block NoiseAnal spectra
    ref = np.zeros_like(ps2d[0])
    for (iby, ibx), _ in mos._block_items():
        na = NoiseAnal(mos[ibx, iby], "whitenoise1")
        na(padding=False)
        ref += na.ps2d / 4
    np.testing.assert_allclose(ps2d[0], ref, rtol=1e-12)

    # Suite: prime-hashed members cover all four blocks exactly once
    suite = Suite(cfg_dict["OUT"], nrun=4)
    idx = {suite.block_index(ib) for ib in range(4)}
    assert idx == {(0, 0), (0, 1), (1, 0), (1, 1)}
    scov = suite.get_coverage_map(overwrite=True)
    assert scov.shape == (4,)
    np.testing.assert_allclose(sorted(scov), sorted(cov.ravel()))
    s2d, s1d, swn = suite.get_noise_power_spectra(overwrite=True)
    LP = suite.cfg.NsideP // 8 * 8   # suites keep the padding region
    assert s2d.shape == (2, LP // 8, LP // 8)
    assert np.all(np.isfinite(s2d)) and s2d.max() > 0
