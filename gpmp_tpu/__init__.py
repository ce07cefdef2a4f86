# gpmp_tpu/__init__.py
"""gpmp_tpu: a TPU-native exact Gaussian-process framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of gpmp
(kriging, covariance-parameter selection, diagnostics, conditional
simulation, posterior sampling of covariance parameters), designed
TPU-first: jit-compiled compute paths, autodiff criteria, vmapped
samplers, and mesh-sharded large-n linear algebra.

API layout mirrors the reference (/root/reference/gpmp/__init__.py):
``Model`` at the root plus lazily-loaded submodules.
"""

from __future__ import annotations

import importlib
from typing import Final

from . import config as config  # eager: sets up dtype before num import
from .core import Model

__all__ = [
    "Model",
    "__version__",
    "config",
    "num",
    "kernel",
    "core",
    "dataloader",
    "modeldiagnosis",
    "mcmc",
    "parameter",
    "misc",
    "plot",
    "ops",
    "parallel",
]

__version__ = "0.1.0"

_LAZY_SUBMODULES: Final[set] = {
    "num",
    "kernel",
    "dataloader",
    "modeldiagnosis",
    "mcmc",
    "parameter",
    "misc",
    "plot",
    "ops",
    "parallel",
}


def __getattr__(name: str):
    if name in _LAZY_SUBMODULES:
        module = importlib.import_module(f"{__name__}.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals().keys()) | _LAZY_SUBMODULES)
