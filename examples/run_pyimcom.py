"""Minimal block-coadd example (counterpart of reference
examples/run_pyimcom.py).

Usage::

    python examples/run_pyimcom.py <config.json> <this_sub>
"""

import sys

from pyimcom_tpu.coadd import Block
from pyimcom_tpu.config import Config

if __name__ == "__main__":
    cfg = Config(sys.argv[1])

    # cfg.extrainput = [None, 'truth', 'cstar14', 'whitenoise1', '1fnoise2']
    cfg.extrainput = [None]
    cfg.stoptile = 4
    cfg.pad_sides = "all"

    this_sub = int(sys.argv[2])
    blk = Block(cfg=cfg, this_sub=this_sub)
