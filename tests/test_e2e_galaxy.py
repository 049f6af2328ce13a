"""End-to-end extended-object injection test: coadd a sheared Gaussian
galaxy grid and compare adaptive moments against the analytic covariance
(reference test_pyimcom.py:1040-1054 checks Cxx/Cxy/Cyy to 3e-4 arcsec^2)."""

import numpy as np
import pytest

from survey_fixture import SIG_OUT, build_survey

from pyimcom_tpu.config import Config
from pyimcom_tpu.coadd import Block
from pyimcom_tpu.fitsio import fits_read
from pyimcom_tpu.layer import _shear_matrix
from pyimcom_tpu.utils.moments import find_adaptive_moments

pytestmark = pytest.mark.slow  # full block coadds (minutes on 1-core host)


@pytest.fixture(scope="module")
def galaxy_block(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_gal")
    cfg_dict = build_survey(
        tmp, n_obs=8,
        extrainput=["gsext14,n=0.5,hlr=0.1,shape=0.2:0.1"],
        config_overrides={"STOP": 4})
    Block(cfg=Config(cfg_dict), this_sub=1)
    return tmp


def test_galaxy_moments_vs_analytic(galaxy_block):
    tmp = galaxy_block
    f = fits_read(str(tmp / "out/testout_F_00_01.fits"))
    img = f[0].data[0, 1]
    iy, ix = np.unravel_index(np.argmax(img), img.shape)
    win = 12
    assert win <= ix < img.shape[1] - win and win <= iy < img.shape[0] - win
    sub = np.asarray(img[iy - win:iy + win + 1, ix - win:ix + win + 1],
                     dtype=np.float64)
    m = find_adaptive_moments(sub, guess_sigma=3.0)
    assert m.converged

    # analytic covariance in output pixels: target PSF + sheared galaxy,
    # mapped through the actual output WCS Jacobian (LONPOLE=240 rotates the
    # output frame away from the naive (-east, north) axes).
    from pyimcom_tpu.wcsutil import WCS, local_partial_pixel_derivatives2

    w = WCS.from_header(f[0].header)
    sigma_gal = 0.1 / np.sqrt(2 * np.log(2))  # arcsec
    M = _shear_matrix(0.2, 0.1)
    C_sky = sigma_gal ** 2 * (M @ M.T)  # arcsec^2
    scale = 0.04
    Jout = local_partial_pixel_derivatives2(w, float(ix), float(iy)) * 3600.0
    B = np.linalg.inv(Jout)  # arcsec -> output px
    want = SIG_OUT ** 2 * np.eye(2) + B @ C_sky @ B.T
    got = np.array([[m.Mxx, m.Mxy], [m.Mxy, m.Myy]])
    # compare in arcsec^2 (reference tolerance 3e-4; allow 5e-4 here)
    diff = np.abs(got - want) * scale ** 2
    print("moments (px^2): got", got.ravel(), "want", want.ravel())
    assert np.all(diff < 5e-4), (got, want, diff)

    # unit flux recovered: sum over the full galaxy footprint ~ 1/sc
    sc = (0.04 / 0.11) ** 2
    tot = sub.sum() * sc
    assert 0.97 < tot < 1.03
