"""Metadetection post-processing: analytic interpolation + sheared resampling."""

from .distortimage import MetaMosaic, shearmosaic  # noqa: F401
from .ginterp import InterpMatrix, MultiInterp  # noqa: F401
