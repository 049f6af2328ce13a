"""Mosaic picture generation."""

from .genpic import cmapscale, make_picture_1band  # noqa: F401
