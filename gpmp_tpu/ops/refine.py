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

# relative Frobenius residual^2 acceptance for the refined factor.
# NOTE the hardware floor: the TPU's emulated f64 matmul has a
# value-dependent error when accumulation is sign-coherent (L @ L.T is
# ~1e-10 relative, unlike random signed products at ~3e-15), so the
# measured residual of a perfectly refined factor still reads
# ~1e-8..1e-7 relative for n >= ~4k.  Callers that only need a
# statistically exact factor (sample paths) should pass a looser rtol2.
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


def refined_cholesky(A, steps=2, with_inverse=False, rtol2=_FACTOR_RTOL2):
    """f64-accurate lower Cholesky factor of SPD A via f32 + refinement.

    Returns L, or (L, M ~= L^{-1}) with with_inverse=True.  Outputs are
    NaN when the f32 factorization fails (non-PD) or the final relative
    factor residual^2 exceeds ``rtol2`` (refinement not converged:
    cond(A) beyond the f32 dynamic range, or n large enough that the
    emulated-f64 matmul floor dominates -- see _FACTOR_RTOL2 note).
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
    ok = err2 < rtol2
    L = jnp.where(ok, L, jnp.nan)
    if with_inverse:
        return L, jnp.where(ok, M, jnp.nan)
    return L


def sampling_sqrt(K):
    """C with C C^T ~= K (relative error ~1e-9): the sampling factor.

    C is NOT triangular -- it is L32 (I + Dt/2) with
    Dt = M (K - L32 L32^T) M^T, so C C^T = K + L (Dt^2/4) L^T.  Any
    such square root is a valid sampling factor (z = C eps has
    covariance C C^T), and this one needs only 4 f64 matmuls versus
    ~16 for a fully refined triangular factor -- the cheapest f64-
    accurate option under the emulated-f64 matmul cost model.

    Guard: measured (CPU oracle sweep, cond 1e2..1e7): the covariance
    error stays below ~1e-8 relative wherever the f32 factorization
    survives, because Dt is large exactly where L is small (the error
    L Dt^2 L^T self-compensates).  |Dt|_F^2 < 1e2 only filters runaway
    cases; genuine non-PD K already yields NaN through chol32.
    """
    n = K.shape[0]
    K32 = K.astype(jnp.float32)
    ridge = 10.0 * jnp.finfo(jnp.float32).eps * (jnp.trace(K32) / n)
    L32 = jnp.linalg.cholesky(K32 + ridge * jnp.eye(n, dtype=jnp.float32))
    from .mixed import _block_tri_inv

    M32 = _block_tri_inv(L32)
    L = L32.astype(K.dtype)
    M = M32.astype(K.dtype)
    E = K - L @ L.T
    Dt = M @ (E @ M.T)
    ok = jnp.sum(Dt * Dt) < 1e2
    C = L + 0.5 * (L @ Dt)
    return jnp.where(ok, C, jnp.nan)


def refined_solve_lower(L, M, B, n_refine=1):
    """T solving T L^T = B (right triangular solve) as matmuls:
    T0 = B M^T, then residual refinement T += (B - T L^T) M^T."""
    T = B @ M.T
    for _ in range(n_refine):
        T = T + (B - T @ L.T) @ M.T
    return T
