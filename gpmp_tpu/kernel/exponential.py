# gpmp_tpu/kernel/exponential.py
"""Exponential kernel (reference /root/reference/gpmp/kernel/exponential.py)."""

import gpmp_tpu.num as gnp


def exponential_kernel(h):
    """k(h) = exp(-h)."""
    return gnp.exp(-h)
