"""The shipped configs/ suite loads through Config with derived params.

Mirrors the reference's configs/ directory (default_config.json + the
paper-4 hyperparameter sweep, reference configs/paper4_configs/): every
generated file must parse, validate, and produce consistent derived
quantities.
"""

import json
import pathlib

import pytest

from pyimcom_tpu.config import Config

ROOT = pathlib.Path(__file__).resolve().parent.parent / "configs"
ALL = sorted(ROOT.glob("**/*.json"))


def test_suite_present():
    assert (ROOT / "default_config.json").exists()
    # 5 bands x (Chol: 13, Iter: 11) variants
    assert len(ALL) >= 120


@pytest.mark.parametrize("path", ALL, ids=lambda p: p.stem)
def test_config_loads(path):
    cfg = Config(json.loads(path.read_text()))
    assert cfg.nblock == 36
    assert cfg.n1 == 80 and cfg.n2 == 32
    assert cfg.linear_algebra in ("Cholesky", "Iterative")
    assert cfg.instamp_pad > 0  # radians, derived from INPAD arcsec
    # every sweep file embeds its own name in OUT
    if path.parent.name == "sweep_configs":
        assert path.stem in cfg.outstem
