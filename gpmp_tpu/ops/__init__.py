# gpmp_tpu/ops/__init__.py
"""Pallas TPU kernels for the hot ops (VMEM-resident blocked Cholesky)."""

from .cholesky import cholesky, cholesky_pallas

__all__ = ["cholesky", "cholesky_pallas"]
