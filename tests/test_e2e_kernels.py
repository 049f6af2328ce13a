"""Cross-kernel end-to-end consistency on a 2-stamp block region
(reference test_pyimcom.py:953-978: Cholesky vs multi-kappa vs Empirical vs
Iterative on the science-star field)."""

import numpy as np
import pytest

from survey_fixture import SC, SDEC, SIG_OUT, SRA, build_survey

from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block
from pyimcom_tpu.fitsio import fits_read
from pyimcom_tpu.wcsutil import WCS

pytestmark = pytest.mark.slow  # full block coadds (minutes on 1-core host)


@pytest.fixture(scope="module")
def kernel_runs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_kern")
    base = build_survey(tmp, n_obs=8, extrainput=["cstar14"],
                        config_overrides={"STOP": 2})
    outputs = {}
    variants = {
        "chol": {},
        "multik": {"KAPPAC": [5e-4, 1e-3, 2e-3]},
        "empir": {"LAKERNEL": "Empirical"},
        "iter": {"LAKERNEL": "Iterative", "ITERRTOL": 1.5e-3, "ITERMAX": 30},
        # multi-kappa Eigen, host bisection kernel (reference
        # test_pyimcom.py:953-959 cross-checks Cholesky vs eigen multi-kappa)
        "eigen": {"LAKERNEL": "Eigen", "KAPPAC": [5e-4, 1e-3, 2e-3]},
        # multi-kappa Eigen through the device-assembly path
        # (solvers.eigen_solve_device dense-kappa-grid emulation)
        "eigdev": {"LAKERNEL": "Eigen", "KAPPAC": [5e-4, 1e-3, 2e-3],
                   "_env": {"PYIMCOM_DEVICE_ASSEMBLY": "1",
                            "PYIMCOM_EIGEN_NODES": "9"}},
    }
    import os

    for name, over in variants.items():
        over = dict(over)
        env = over.pop("_env", {})
        cfg_d = dict(base)
        cfg_d.update(over)
        cfg_d["OUT"] = base["OUT"] + "_" + name
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            Block(cfg=Config(cfg_d), this_sub=1)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        outputs[name] = str(tmp) + f"/out/testout_F_{name}_00_01.fits"
    return outputs


def _star_image(path):
    f = fits_read(path)
    w = WCS.from_header(f[0].header)
    xs, ys = w.world2pix(SRA, SDEC)
    return np.asarray(f[0].data[0, 0], dtype=np.float64), float(xs), float(ys)


def test_kernels_consistent(kernel_runs):
    d_chol, xs, ys = _star_image(kernel_runs["chol"])
    d_mk, _, _ = _star_image(kernel_runs["multik"])
    d_it, _, _ = _star_image(kernel_runs["iter"])
    d_em, _, _ = _star_image(kernel_runs["empir"])
    region = np.s_[0:25, 25:50]  # the coadded stamp containing the star

    # single-kappa Cholesky vs multi-kappa: tight (reference saw <5e-6 on its
    # 14-exposure fixture; this 6-exposure survey is conditioned differently)
    assert np.std((d_chol - d_mk)[region]) < 3e-5
    assert abs(np.mean((d_chol - d_mk)[region])) < 2e-6
    # vs iterative: looser (reference <2.5e-3)
    assert np.std((d_chol - d_it)[region]) < 2.5e-3
    # empirical differs but is bounded by the signal scale
    assert np.std((d_chol - d_em)[region]) < 1.05 * np.std(d_chol[region])


def test_eigen_kernel_consistent(kernel_runs):
    """Multi-kappa Eigen (host bisection AND device dense-grid emulation)
    agrees with the multi-kappa Cholesky run at the reference's cross-kernel
    tolerance class (reference test_pyimcom.py:953-959: std(diff) < 5e-6 on
    its 14-exposure fixture; this 6-exposure survey is conditioned
    differently, same class)."""
    d_mk, _, _ = _star_image(kernel_runs["multik"])
    d_eig, _, _ = _star_image(kernel_runs["eigen"])
    d_eigdev, _, _ = _star_image(kernel_runs["eigdev"])
    region = np.s_[0:25, 25:50]

    assert np.std((d_mk - d_eig)[region]) < 3e-5
    assert abs(np.mean((d_mk - d_eig)[region])) < 2e-6
    # device dense-kappa-grid emulation: resolution bounded by node spacing
    assert np.std((d_mk - d_eigdev)[region]) < 3e-5
    assert abs(np.mean((d_mk - d_eigdev)[region])) < 2e-6

    # star recovered by the Eigen runs in this region
    d_eig_star, xs, ys = _star_image(kernel_runs["eigen"])
    yy, xx = np.mgrid[0:d_eig_star.shape[0], 0:d_eig_star.shape[1]]
    p = np.exp(-0.5 * ((xx - xs) ** 2 + (yy - ys) ** 2) / SIG_OUT ** 2) \
        / (2 * np.pi * SIG_OUT ** 2 * SC)
    SL1 = np.sum((p * d_eig_star)[region]) / np.sum((p ** 2)[region])
    assert abs(SL1 - 1) < 1e-3
