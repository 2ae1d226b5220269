"""Metric modules, mirroring ``rapidfuzz::distance`` (``src/lib.rs:97-100``)."""

from . import levenshtein  # noqa: F401

__all__ = ["levenshtein"]
