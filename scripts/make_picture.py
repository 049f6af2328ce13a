#!/usr/bin/env python
"""
Stand-alone script to make a display PNG image from a mosaic
(counterpart of reference scripts/make_picture_1band.py).

Calling format::

    python scripts/make_picture.py <stem> <xstart> <ystart> <n> <out.png>

where block files are <stem>_XX_YY.fits and an n x n block region starting
at (xstart, ystart) is rendered with the asinh stretch.
"""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 5:
        print(__doc__)
        return 1
    stem, xs, ys, n, out = argv[0], int(argv[1]), int(argv[2]), int(argv[3]), argv[4]
    from pyimcom_tpu.pictures.genpic import make_picture_1band

    make_picture_1band(stem, out, bounds=[ys, ys + n, xs, xs + n])
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
