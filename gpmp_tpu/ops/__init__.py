# gpmp_tpu/ops/__init__.py
"""TPU-native hot ops: the Pallas blocked Cholesky kernel, the
mixed-precision solve/logdet/diag engine, and f32+refinement factors."""

from .cholesky import cholesky, cholesky_pallas
from .mixed import (
    mp_cholesky,
    mp_logdet,
    mp_solve_and_inv_diag,
    mp_solve_and_logdet,
    refined_cholesky_solve,
    refined_solve,
)
from .refine import newton_tri_inv, refined_cholesky, sampling_sqrt

__all__ = [
    "cholesky",
    "cholesky_pallas",
    "mp_cholesky",
    "mp_logdet",
    "mp_solve_and_inv_diag",
    "mp_solve_and_logdet",
    "refined_cholesky_solve",
    "refined_solve",
    "newton_tri_inv",
    "refined_cholesky",
    "sampling_sqrt",
]
