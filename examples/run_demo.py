"""
Self-contained demo: build a synthetic dithered survey, coadd one block, and
verify the recovered star against the analytic target PSF.

Run:  python examples/run_demo.py [workdir]
"""

import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)

    from survey_fixture import SC, SDEC, SIG_OUT, SRA, build_survey

    from pyimcom_tpu.coadd import Block
    from pyimcom_tpu.config import Config
    from pyimcom_tpu.fitsio import fits_read
    from pyimcom_tpu.wcsutil import WCS

    workdir = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else \
        pathlib.Path(tempfile.mkdtemp(prefix="pyimcom_demo_"))
    print("working in", workdir)

    cfg_dict = build_survey(workdir, n_obs=8, extrainput=["cstar14"])
    Block(cfg=Config(cfg_dict), this_sub=1)

    f = fits_read(str(workdir / "out/testout_F_00_01.fits"))
    w = WCS.from_header(f[0].header)
    xs, ys = w.world2pix(SRA, SDEC)
    d = np.asarray(f[0].data[0, 0], dtype=np.float64)
    yy, xx = np.mgrid[0:d.shape[0], 0:d.shape[1]]
    p = np.exp(-0.5 * ((xx - float(xs)) ** 2 + (yy - float(ys)) ** 2) / SIG_OUT ** 2) \
        / (2 * np.pi * SIG_OUT ** 2 * SC)
    SL1 = np.sum(p * d) / np.sum(p ** 2)
    VAR = np.sum((d - SL1 * p) ** 2) / np.sum(p ** 2)
    print(f"star amplitude ratio SL1 = {SL1:.6f} (want 1 +- 5e-4)")
    print(f"residual variance  VAR = {VAR:.2e} (want < 1e-5)")


if __name__ == "__main__":
    main()
