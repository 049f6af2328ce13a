"""Interactive config builder test (reference config.py:632-1102 analog)."""

import numpy as np


def test_build_config_interactive(tmp_path):
    from pyimcom_tpu.config import Config, build_config_interactive

    answers = {
        "OBSFILE": "obs.fits",
        "INDATA": "/data L2_fits",
        "FILTER": "1",
        "INPSF": "/psf L2_fits 8",
        "CTR": "60.0 -3.8",
        "BLOCK": "2",
        "OUTSIZE": "4 25 0.04",
        "OUT": "/tmp/out/test",
        "EXTRAINPUT": "whitenoise1, cstar14",
        "LAKERNEL": "Iterative",
        "KAPPAC": "1e-5 1e-4",
        "FADE": "2",
        "PSFCIRC": "true",
    }
    prompts = []

    def fake_input(prompt):
        prompts.append(prompt)
        key = prompt.split(" ")[0]
        return answers.get(key, "")

    out = str(tmp_path / "built.json")
    cfg = build_config_interactive(input_fn=fake_input,
                                   output=lambda *a: None, outfile=out)
    assert cfg.n1 == 4 and cfg.n2 == 25 and cfg.nblock == 2
    assert cfg.use_filter == 1 and cfg.inpsf_oversamp == 8
    assert cfg.extrainput == [None, "whitenoise1", "cstar14"]
    assert cfg.linear_algebra == "Iterative"
    np.testing.assert_allclose(cfg.kappaC_arr, [1e-5, 1e-4])
    assert cfg.fade_kernel == 2 and cfg.psf_circ is True
    # round trip through the written file
    cfg2 = Config(out)
    cfg2()
    assert cfg2.to_dict() == cfg.to_dict()
