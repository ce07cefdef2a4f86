# gpmp_tpu/ops/__init__.py
"""TPU-native hot ops: the mixed-precision solve/logdet/diag engine
and f32+refinement factors (f32 factorizations, f64 matmul math)."""

from .mixed import (
    mp_cholesky,
    mp_logdet,
    mp_solve_and_inv_diag,
    mp_solve_and_logdet,
    mp_solve_and_logdet_fwdmode,
    refined_cholesky_solve,
    refined_solve,
    refined_solve_fwdmode,
)
from .refine import newton_tri_inv, refined_cholesky, sampling_sqrt

__all__ = [
    "mp_cholesky",
    "mp_logdet",
    "mp_solve_and_inv_diag",
    "mp_solve_and_logdet",
    "mp_solve_and_logdet_fwdmode",
    "refined_cholesky_solve",
    "refined_solve",
    "refined_solve_fwdmode",
    "newton_tri_inv",
    "refined_cholesky",
    "sampling_sqrt",
]
