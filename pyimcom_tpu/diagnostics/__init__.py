"""Validation report generation for coadded mosaics."""

from .report import ReportSection, ValidationReport  # noqa: F401
