#!/usr/bin/env python
"""
Generate the shipped configs/ suite.

The reference carries `configs/default_config.json` plus 165 paper3/4
hyperparameter-sweep configs (reference configs/paper4_configs/,
BASELINE.md "Hyperparameter sweep envelope": INPAD 0.45-1.24",
KAPPAC 1e-5-1e-3, ITERRTOL 5e-4-4.5e-3, Cholesky vs Iterative per band).
Rather than hand-transcribing 165 JSON files, this generator programs the
sweep structure: per-band benchmark configs for each solver kernel plus
the INPAD / KAPPAC / target-PSF / penalty variants of the paper-4 study.

Paths point at $PYIMCOM_DATA (environment-substituted by the user);
every file loads through pyimcom_tpu.config.Config (smoke-tested by
tests/test_configs_suite.py).

Band constants (FILTER index, target Gaussian sigma in output pixels,
Cholesky kappa/C) are survey-design values from the reference sweep
(reference configs/paper4_configs/*_benchmark.json).
"""

import copy
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent / "configs"

# band: (filter index, EXTRASMOOTH sigma [out px], Cholesky KAPPAC)
BANDS = {
    "Y106": (4, 0.8493218002880191, 2e-4),
    "J129": (3, 0.89178789030242, 4e-4),
    "H158": (2, 0.934253980316821, 6e-4),
    "F184": (1, 0.9767200703312219, 8e-4),
    "K213": (10, 1.019186160345623, 1e-3),
}

DATA = "$PYIMCOM_DATA"

BASE = {
    "OBSFILE": f"{DATA}/Roman_WAS_obseq.fits",
    "INDATA": [f"{DATA}/sim-input", "anlsim"],
    "FILTER": 4,
    "INPSF": [f"{DATA}/sim-input/psf", "anlsim", 8],
    "PMASK": f"{DATA}/permanent_mask.fits",
    "CMASK": 0.00077,
    "EXTRAINPUT": ["labnoise", "gsstar14", "gsext14,seed=100",
                   "1fnoise9", "whitenoise10"],
    "LABNOISETHRESHOLD": 3.0,
    "CTR": [9.55, -44.1],
    "BLOCK": 36,
    "OUTSIZE": [80, 32, 0.0390625],
    "FADE": 3,
    "PAD": 2,
    "PADSIDES": "all",
    "STOP": 0,
    "OUTMAPS": "USTN",
    "OUT": f"{DATA}/out/coadd",
    "TEMPFILE": "/tmp/pyimcom_run",
    "INLAYERCACHE": "",
    "NOUT": 1,
    "OUTPSF": "GAUSSIAN",
    "EXTRASMOOTH": BANDS["Y106"][1],
    "NPIXPSF": 48,
    "PSFCIRC": False,
    "PSFNORM": False,
    "AMPPEN": [0.0, 0.0],
    "FLATPEN": 0.0,
    "UCMIN": 1e-06,
    "SMAX": 0.5,
}

CHOL = {"LAKERNEL": "Cholesky", "INPAD": 1.24, "KAPPAC": [2e-4]}
ITER = {"LAKERNEL": "Iterative", "INPAD": 0.6, "KAPPAC": [0.0],
        "ITERRTOL": 0.0015, "ITERMAX": 30}

# paper-4 style study variants (applied on top of the band benchmark)
VARIANTS = {
    "inpad=0.76": {"INPAD": 0.76},
    "inpad=1.00": {"INPAD": 1.00},
    "kappac_3x": {"_kappac_scale": 3.0},
    "kappac_9x": {"_kappac_scale": 9.0},
    "gauss_0.8x": {"_smooth_scale": 0.8},
    "gauss_1.2x": {"_smooth_scale": 1.2},
    "flatpen": {"FLATPEN": 2e-7},
    "amppen": {"AMPPEN": [1.0, 1.5]},
    "psfcirc": {"PSFCIRC": True},
    "psfnorm": {"PSFNORM": True},
    "airyobsc": {"OUTPSF": "AIRYOBSC"},
    "airyunobsc": {"OUTPSF": "AIRYUNOBSC"},
}


def band_config(band, solver):
    filt, smooth, kap = BANDS[band]
    d = copy.deepcopy(BASE)
    d["FILTER"] = filt
    d["EXTRASMOOTH"] = smooth
    d.update(CHOL if solver == "Chol" else ITER)
    if solver == "Chol":
        d["KAPPAC"] = [kap]
    return d


def apply_variant(cfg, spec):
    d = copy.deepcopy(cfg)
    for k, v in spec.items():
        if k == "_kappac_scale":
            d["KAPPAC"] = [x * v for x in d["KAPPAC"]]
        elif k == "_smooth_scale":
            d["EXTRASMOOTH"] = d["EXTRASMOOTH"] * v
        else:
            d[k] = v
    return d


def main():
    ROOT.mkdir(exist_ok=True)
    sweep = ROOT / "sweep_configs"
    sweep.mkdir(exist_ok=True)

    default = band_config("Y106", "Iter")
    (ROOT / "default_config.json").write_text(
        json.dumps(default, indent=4) + "\n")

    n = 1
    for band in BANDS:
        for solver in ("Chol", "Iter"):
            base = band_config(band, solver)
            name = f"{band}_{solver}_benchmark"
            base["OUT"] = f"{DATA}/out/{name}/{name}"
            (sweep / f"{name}.json").write_text(
                json.dumps(base, indent=4) + "\n")
            n += 1
            for vname, spec in VARIANTS.items():
                # kappa variants only make sense for the Cholesky kernel
                if solver == "Iter" and vname.startswith("kappac"):
                    continue
                d = apply_variant(base, spec)
                name_v = f"{band}_{solver}_{vname}"
                d["OUT"] = f"{DATA}/out/{name_v}/{name_v}"
                (sweep / f"{name_v}.json").write_text(
                    json.dumps(d, indent=4) + "\n")
                n += 1
    print(f"wrote {n} configs under {ROOT}")


if __name__ == "__main__":
    main()
