# gpmp_tpu/core/__init__.py
"""Core GP math: Model facade + pure numerical routines.

Mirrors /root/reference/gpmp/core/__init__.py exports.
"""

from .model import Model
from . import fisher, kriging, likelihood, linalg, loo, sample_paths, utils

__all__ = [
    "Model",
    "fisher",
    "kriging",
    "likelihood",
    "linalg",
    "loo",
    "sample_paths",
    "utils",
]
