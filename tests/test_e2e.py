"""
End-to-end block coaddition test on a synthetic miniature survey.

Port of the reference acceptance criteria (tests/pyimcom/test_pyimcom.py:
922-1010): coadd one block of a 2x2 mosaic from dithered multi-roll
exposures of a single star plus injected star grids and noise fields, then
check the recovered star against the analytic Gaussian target PSF, the
leakage/noise maps, and the output-file structure.
"""

import numpy as np
import pytest

from survey_fixture import SC, SDEC, SIG_OUT, SRA, build_survey

from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block
from pyimcom_tpu.fitsio import fits_read
from pyimcom_tpu.wcsutil import WCS

pytestmark = pytest.mark.slow  # full block coadds (minutes on 1-core host)


@pytest.fixture(scope="module")
def block_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg_dict = build_survey(tmp, n_obs=8, extrainput=["cstar14", "whitenoise1"])
    cfg = Config(cfg_dict)
    Block(cfg=cfg, this_sub=1)
    return tmp, cfg


def test_science_star_recovery(block_run):
    """Recovered star amplitude within 5e-4 and residual VAR < 1e-5
    (reference test_pyimcom.py:950-951)."""
    tmp, cfg = block_run
    f = fits_read(str(tmp / "out/testout_F_00_01.fits"))
    w = WCS.from_header(f[0].header)
    xs, ys = w.world2pix(SRA, SDEC)
    xs, ys = float(xs), float(ys)
    d = f[0].data[0, 0]
    ny, nx = d.shape
    x, y = np.meshgrid(np.arange(nx), np.arange(ny))
    p = np.exp(-0.5 * ((x - xs) ** 2 + (y - ys) ** 2) / SIG_OUT ** 2) \
        / (2 * np.pi * SIG_OUT ** 2 * SC)
    SL1 = np.sum(p * d) / np.sum(p ** 2)
    VAR = np.sum((d - SL1 * p) ** 2) / np.sum(p ** 2)
    print("SL1 =", SL1, "VAR =", VAR)
    assert np.abs(SL1 - 1) < 5e-4
    assert VAR < 1e-5


def test_injected_star_layer(block_run):
    """Injected cstar grid stars also reconstruct as the target Gaussian."""
    tmp, cfg = block_run
    f = fits_read(str(tmp / "out/testout_F_00_01.fits"))
    dc = f[0].data[0, 1]
    iy, ix = np.unravel_index(np.argmax(dc), dc.shape)
    ny, nx = dc.shape
    # a star from the HEALPix res-14 grid must exist in this block interior
    assert 5 <= ix < nx - 5 and 5 <= iy < ny - 5
    # fit amplitude + centroid of the peak region against the Gaussian model
    win = 8
    sub = dc[iy - win:iy + win + 1, ix - win:ix + win + 1]
    yy, xx = np.mgrid[-win:win + 1, -win:win + 1]
    tot = sub.sum()
    cx = (sub * xx).sum() / tot
    cy = (sub * yy).sum() / tot
    p = np.exp(-0.5 * ((xx - cx) ** 2 + (yy - cy) ** 2) / SIG_OUT ** 2) \
        / (2 * np.pi * SIG_OUT ** 2 * SC)
    SL1 = np.sum(p * sub) / np.sum(p ** 2)
    VAR = np.sum((sub - SL1 * p) ** 2) / np.sum(p ** 2)
    print("cstar SL1 =", SL1, "VAR =", VAR)
    assert np.abs(SL1 - 1) < 2e-3
    assert VAR < 1e-4


def test_noise_layer_statistics(block_run):
    """White-noise layer: output std consistent with the Sigma map."""
    tmp, cfg = block_run
    f = fits_read(str(tmp / "out/testout_F_00_01.fits"))
    dn = f[0].data[0, 2]
    sigma_map = 10.0 ** (np.asarray(f["SIGMA"].data[0], dtype=np.float64)
                         / -10000.0)
    ratio = np.std(dn) / np.sqrt(np.median(sigma_map))
    print("noise std ratio:", ratio)
    assert 0.7 < ratio < 1.3


def test_quality_maps(block_run):
    """Leakage at or below the 1e-6 target; maps present and sane."""
    tmp, cfg = block_run
    f = fits_read(str(tmp / "out/testout_F_00_01.fits"))
    # single-kappa configs drop the KAPPA map (reference config.py:439-440)
    for name in ["FIDELITY", "SIGMA", "INWTSUM", "EFFCOVER"]:
        assert f[name].data is not None, name
    assert "KAPPA" not in [h.name for h in f]
    uc = 10.0 ** (np.asarray(f["FIDELITY"].data, dtype=np.float64) / -5000.0)
    assert np.median(uc) < 2e-6
    neff = 10.0 ** (np.asarray(f["EFFCOVER"].data, dtype=np.float64) / 50000.0)
    assert np.median(neff) > 2.0  # several effective exposures everywhere


def test_config_roundtrip_from_block(block_run):
    """The CONFIG HDU reconstructs a working Config (reference
    config.py:383-391 'block' inmode)."""
    tmp, cfg = block_run
    cfg2 = Config(str(tmp / "out/testout_F_00_01.fits"), inmode="block")
    assert cfg2.n1 == cfg.n1 and cfg2.n2 == cfg.n2
    assert cfg2.use_filter == cfg.use_filter
    assert abs(cfg2.instamp_pad - cfg.instamp_pad) < 1e-15


def test_inweight_tables(block_run):
    tmp, cfg = block_run
    f = fits_read(str(tmp / "out/testout_F_00_01.fits"))
    tw = f["INWEIGHT"].data
    assert tw.ndim == 4
    # total per-stamp weight is uniform across the block and order-unity
    tot = tw.sum(axis=1)
    assert np.all(np.abs(tot - np.mean(tot)) < 1e-3)
    assert 0.8 < np.mean(tot) < 1.3
    obs = f["INDATA"]
    assert len(obs["obsid"]) == tw.shape[1]


def test_diagnostics_star_data(block_run):
    """dynrange histograms + noiseless star cube over the coadded block
    (reference diagnostics/dynrange.py:28, starcube_nonoise.py:28)."""
    from pyimcom_tpu.diagnostics.starsdata import (
        gen_dynrange_data,
        gen_starcube_nonoise,
    )

    tmp, cfg = block_run

    def infile(ibx, iby):
        return f"{cfg.outstem}_{ibx:02d}_{iby:02d}.fits"

    out1 = gen_dynrange_data(infile, str(tmp / "diag"), nblockmax=2)
    assert out1["COUNTBLOCK"] == 1
    assert out1["SQRTS"] is not None and out1["NEFF"] is not None
    hist = np.loadtxt(out1["SQRTS"])
    assert hist.shape == (100, 2) and hist[:, 1].sum() > 0
    # no nstar layer in this survey -> no dynamic-range table
    assert out1["DYNRANGE"] is None

    out2 = gen_starcube_nonoise(infile, str(tmp / "diag"), nblockmax=2)
    assert out2["STARCAT"] is not None and out2["FIDHIST"] is not None
    cat = np.loadtxt(out2["STARCAT"])
    cat = cat.reshape(-1, 22)
    # adaptive sigma of the coadded injected stars ~ target PSF width
    sig = np.median(cat[:, 13])
    assert abs(sig - SIG_OUT) < 0.1 * SIG_OUT


def test_submat_store_spill(tmp_path):
    """Disk-spill submatrix store behaves like a dict and cleans up
    (reference psfutil.py:2056-2085 TEMPFILE spill)."""
    from pyimcom_tpu.coadd import _SubmatStore

    st = _SubmatStore(str(tmp_path / "spill"))
    small = np.ones(4)
    big = np.arange(st.SPILL_BYTES // 8 + 16, dtype=np.float64)
    st[("a",)] = small
    st[("b",)] = big
    assert ("a",) in st and ("b",) in st
    np.testing.assert_array_equal(st[("b",)], big)
    assert len(st.disk) == 1 and len(st.mem) == 1
    import glob
    assert len(glob.glob(str(tmp_path / "spill" / "*.npy"))) == 1
    del st[("b",)]
    assert ("b",) not in st
    assert len(glob.glob(str(tmp_path / "spill" / "*.npy"))) == 0
    assert st.pop(("a",)) is not None and ("a",) not in st
    # no tempdir -> pure RAM
    st2 = _SubmatStore(None)
    st2[("c",)] = big
    assert len(st2.mem) == 1 and not st2.disk
