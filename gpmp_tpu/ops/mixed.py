# gpmp_tpu/ops/mixed.py
"""Mixed-precision Cholesky engine: f32 factorization + f64 matmul math.

On this TPU generation float64 is software-emulated: XLA's f64 Cholesky
AND f64 triangular solves are latency-bound (~70 ms at n=1000), while
f32 factorizations and f64 *matmuls* are fast.  This engine therefore
keeps every sequential-triangular operation in f32 and expresses all
f64 work as matrix multiplications:

1.  L32 = chol_f32(K + ridge), ridge ~ 10 eps32 mean(diag) -- the f32
    factor is only a preconditioner, so the ridge costs nothing in
    accuracy but keeps the f32 factorization alive where f64 would
    still succeed.  XLA's f32 Cholesky is the default (fast and exact
    f32 on TPU); use_pallas=True swaps in the VMEM-resident Pallas
    kernel (ops/cholesky.py), which with precision=HIGHEST dots is
    numerically equivalent but currently slower -- it exists as the
    building block for the distributed blocked factorization;
2.  M = inv(L32) by an f32 triangular solve, promoted to f64.  Solves
    become matmul applications  x -> M^T (M x);
3.  K x = b by iterative refinement:  x += M^T M (b - K x), with the
    residual in f64.  Each sweep contracts the error by
    O(eps32 cond(K));
4.  log det K = 2 sum log diag L32 + log det E,  E = M K M^T -- exact
    for ANY invertible preconditioner.  E is near-identity, so a second
    level (f32 factor of E, then a second-order trace expansion) brings
    the truncation error to f64 roundoff.

All pieces are differentiable JAX ops, so criteria built on this engine
feed jax.value_and_grad directly.  A genuinely non-PD K still surfaces
as NaN (the level-2 f32 factorization fails), which the criterion
wrappers map to +inf.

CONVERGENCE GUARD.  When cond(K) exceeds the f32 dynamic range
(~1e7), refinement stalls and would return finite-but-wrong numbers;
an optimizer exploring such covparams (e.g. noise variance -> 0) would
then converge to a false optimum.  Both entry points therefore check
their own a-posteriori error estimate -- the relative residual
|b - K x| / |b| for solves, |E2 - I|_F for the logdet expansion -- and
replace non-converged outputs with NaN, which the selection-criterion
wrappers map to +inf exactly like a failed f64 Cholesky.
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .cholesky import cholesky

DEFAULT_REFINE_ITERS = 4
_RIDGE_FACTOR = 10.0
# relative-residual^2 acceptance for refined solves: rel < 1e-6
# (converged refinement reaches ~eps64*cond <= 1e-10)
_SOLVE_RTOL2 = 1e-12
# |E2 - I|_F^2 acceptance for the logdet trace expansion: truncation
# error is O(|D2|_F^3), so 1e-8 keeps it below f64 roundoff
_LOGDET_FTOL2 = 1e-8


def _f32_preconditioner(K, use_pallas=False, interpret=False):
    """(L32 promoted to f64, M = L32^{-1} promoted to f64)."""
    n = K.shape[0]
    K32 = K.astype(jnp.float32)
    ridge = _RIDGE_FACTOR * jnp.finfo(jnp.float32).eps * (
        jnp.trace(K32) / n
    )
    K32 = K32 + ridge * jnp.eye(n, dtype=jnp.float32)
    if use_pallas:
        L32 = cholesky(K32, interpret)
    else:
        L32 = jnp.linalg.cholesky(K32)
    M32 = solve_triangular(L32, jnp.eye(n, dtype=jnp.float32), lower=True)
    return L32.astype(K.dtype), M32.astype(K.dtype)


def _apply(M, R):
    """Preconditioner application M^T (M R) -- two f64 matmuls."""
    return M.T @ (M @ R)


def refined_cholesky_solve(K, B, precond=None,
                           n_refine=DEFAULT_REFINE_ITERS, use_pallas=False,
                           interpret=False):
    """Solve K X = B to ~f64 accuracy via f32-preconditioned refinement.

    Returns (X, (L, M)) where L is the promoted f32 factor and M its
    inverse (reusable across solves with the same K).
    """
    if precond is None:
        precond = _f32_preconditioner(K, use_pallas=use_pallas,
                                      interpret=interpret)
    L, M = precond
    squeeze = B.ndim == 1
    Bm = B.reshape(-1, 1) if squeeze else B
    X = _apply(M, Bm)
    for _ in range(n_refine):
        R = Bm - K @ X
        X = X + _apply(M, R)
    # convergence guard: final relative residual must be tiny, else NaN
    R = Bm - K @ X
    rel2 = jnp.sum(R * R) / jnp.maximum(
        jnp.sum(Bm * Bm), jnp.finfo(K.dtype).tiny
    )
    X = jnp.where(rel2 < _SOLVE_RTOL2, X, jnp.nan)
    return (X.reshape(-1) if squeeze else X), precond


def mp_logdet(K, precond, use_pallas=False, interpret=False):
    """log det K to ~f64 accuracy from the f32 preconditioner.

    Uses the EXACT identity log det K = log det(M K M^T) - 2 log det M
    for the triangular preconditioner M (log det M = sum log diag M --
    exact even though M is only an approximate inverse of the f32
    factor), applied at two levels, with a second-order trace expansion
    at the innermost (near-identity) level.
    """
    n = K.shape[0]
    _L, M = precond
    E = M @ K @ M.T  # near-identity, f64 matmuls
    _L_E, M_E = _f32_preconditioner(E, use_pallas=use_pallas,
                                    interpret=interpret)
    E2 = M_E @ E @ M_E.T
    D2 = E2 - jnp.eye(n, dtype=K.dtype)
    d2norm2 = jnp.sum(D2 * D2)
    corr2 = jnp.trace(D2) - 0.5 * d2norm2
    ld = (
        -2.0 * jnp.sum(jnp.log(jnp.diag(M)))
        - 2.0 * jnp.sum(jnp.log(jnp.diag(M_E)))
        + corr2
    )
    # convergence guard: expansion only valid when E2 is near-identity
    return jnp.where(d2norm2 < _LOGDET_FTOL2, ld, jnp.nan)


def mp_solve_and_logdet(K, B, n_refine=DEFAULT_REFINE_ITERS,
                        use_pallas=False, interpret=False):
    """(K^{-1} B, log det K) sharing one preconditioner."""
    X, precond = refined_cholesky_solve(
        K, B, n_refine=n_refine, use_pallas=use_pallas, interpret=interpret
    )
    return X, mp_logdet(K, precond, use_pallas=use_pallas,
                        interpret=interpret)


# backward-compatible helper (factor only)
def mp_cholesky(K, use_pallas=False, interpret=False):
    """Approximate (jittered) lower Cholesky factor from f32."""
    L, _ = _f32_preconditioner(K, use_pallas=use_pallas, interpret=interpret)
    return L
