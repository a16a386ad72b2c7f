"""Thin re-export of the native iso-surface extractor (see native/)."""
from ..native import marching_cubes  # noqa: F401
