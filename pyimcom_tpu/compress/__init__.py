"""Lossy+lossless layer compression of coadded block files."""

from .compressutils import CompressedOutput, ReadFile  # noqa: F401
from .i24 import i24compress, i24decompress  # noqa: F401
