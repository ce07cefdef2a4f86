# gpmp_tpu/plot/__init__.py
"""Plotting helpers (reference gpmp/plot)."""

from .plotutils import Figure, crosssections, plot_loo

__all__ = ["Figure", "crosssections", "plot_loo"]
