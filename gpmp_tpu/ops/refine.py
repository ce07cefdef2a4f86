# gpmp_tpu/ops/refine.py
"""f64-accurate Cholesky factors from f32 factorizations + f64 matmuls.

On TPU, f64 Cholesky / triangular solves are software-emulated and
latency-bound (~70-140 ms at n=1024 on v5e), while f64 *matmuls* are
fast.  This module produces genuinely f64-accurate triangular factors
using only one f32 Cholesky, one f32 triangular solve, and a handful of
f64 matmuls:

  L0 = chol_f32(A)                      (fast, eps32-accurate)
  M  = trisolve_f32(L0, I)              (approximate inverse)
  M <- M (2I - L0 M)                    Newton for the inverse
                                        (quadratic, matmul-only)
  E  = A - L0 L0^T                      f64 residual
  L  = L0 + L0 Phi(M E M^T)             Ogita-Aishima refinement step,
                                        Phi = tril with halved diagonal

Each refinement step contracts the relative factor residual
eps -> O(kappa eps^2); from eps32 ~ 6e-8, two steps reach f64 roundoff
for cond(A) up to ~1e4 and three for ~1e6.  A residual-based guard
turns non-converged factors into NaN (same fail-visible convention as
ops/mixed.py).

Used for the per-panel factorizations of the distributed blocked
Cholesky (parallel/chol.py), where direct f64 panel factorizations cost
n/block * 200 ms of latency.
"""

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

# relative Frobenius residual^2 acceptance for the refined factor
_FACTOR_RTOL2 = 1e-16


def _phi(X):
    """Lower triangle with halved diagonal."""
    return jnp.tril(X) - 0.5 * jnp.diag(jnp.diag(X))


def newton_tri_inv(L, M, steps=1):
    """Newton iteration M <- M (2I - L M) for the inverse of a lower
    triangular L; quadratically convergent, matmul-only, and exactly
    triangularity-preserving (products of lower triangulars)."""
    eye2 = 2.0 * jnp.eye(L.shape[0], dtype=L.dtype)
    for _ in range(steps):
        M = M @ (eye2 - L @ M)
    return M


def refined_cholesky(A, steps=2, with_inverse=False):
    """f64-accurate lower Cholesky factor of SPD A via f32 + refinement.

    Returns L, or (L, M ~= L^{-1}) with with_inverse=True.  Outputs are
    NaN when the f32 factorization fails (non-PD) or the refinement has
    not converged (cond(A) beyond the f32 dynamic range).
    """
    n = A.shape[0]
    A32 = A.astype(jnp.float32)
    L32 = jnp.linalg.cholesky(A32)
    L = L32.astype(A.dtype)
    M = solve_triangular(
        L32, jnp.eye(n, dtype=jnp.float32), lower=True
    ).astype(A.dtype)
    M = newton_tri_inv(L, M, steps=1)
    for _ in range(steps):
        E = A - L @ L.T
        L = L + L @ _phi(M @ E @ M.T)
        M = newton_tri_inv(L, M, steps=1)
    # convergence guard: final factor residual must be ~f64-small
    E = A - L @ L.T
    err2 = jnp.sum(E * E) / jnp.maximum(jnp.sum(A * A),
                                        jnp.finfo(A.dtype).tiny)
    ok = err2 < _FACTOR_RTOL2
    L = jnp.where(ok, L, jnp.nan)
    if with_inverse:
        return L, jnp.where(ok, M, jnp.nan)
    return L


def refined_solve_lower(L, M, B, n_refine=1):
    """T solving T L^T = B (right triangular solve) as matmuls:
    T0 = B M^T, then residual refinement T += (B - T L^T) M^T."""
    T = B @ M.T
    for _ in range(n_refine):
        T = T + (B - T @ L.T) @ M.T
    return T
