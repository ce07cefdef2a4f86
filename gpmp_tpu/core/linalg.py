# gpmp_tpu/core/linalg.py
"""Linear-algebra helpers shared across gpmp_tpu.core.

Reimplements the semantics of /root/reference/gpmp/core/linalg.py:17-141
as pure jittable functions.
"""

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from gpmp_tpu.config import get_chol_engine


# below this size the f64 factorization is already cheap and the mixed
# engine's larger HLO graph only adds compile latency
_MIXED_MIN_N = 192


def chol_engine(n=None):
    """Cholesky engine for SPD solves on the hot paths.

    'f64' (default): exact double-precision factorizations.
    'mixed' (opt-in via config.set_chol_engine('mixed'), or the
    GPMP_CHOL_ENGINE env var as import-time initializer): f32
    factorization + f64 matmul-based refinement with trace-series
    logdet/diag and an analytic custom VJP (gpmp_tpu.ops.mixed) --
    ~4-10x faster on TPU where f64 Cholesky is emulated; accurate to
    ~1e-10 relative for cond(K) within the f32 range (~1e7),
    NaN->+inf beyond.

    When the problem size ``n`` is passed, 'mixed' only engages for
    n >= 192: small factorizations are latency-trivial either way and
    the f64 graph compiles much faster.

    Dispatch happens at jit trace time from ``get_config().chol_engine``
    (validated at set time); there is no env read on traced paths.
    """
    eng = get_chol_engine()
    eng = "f64" if eng == "auto" else eng
    if eng == "mixed" and n is not None and n < _MIXED_MIN_N:
        return "f64"
    return eng


def _engine_for(K, *arrays):
    """chol_engine(n) (kept as a separate hook for formulation choices
    that depend on the engine, e.g. norm_k_sqrd and the LOO variants).

    Forward-mode autodiff handling moved INTO the dispatchers below:
    the mixed engine's custom-VJP entry points reject jax.jacfwd /
    jax.hessian traces with a TypeError at trace time, which the
    dispatchers catch (ops.mixed.is_fwd_mode_error) to retry on the
    custom_jvp twins -- second-order autodiff then stays on the mixed
    engine instead of demoting to f64 (round-2 behavior).
    """
    return chol_engine(K.shape[0])


def _log_fwdmode_retry():
    from gpmp_tpu.config import get_logger

    get_logger().info(
        "mixed Cholesky engine: forward-mode autodiff (jacfwd/hessian) "
        "trace detected; using the custom_jvp twin for this trace."
    )


def solve_and_logdet(K, rhs):
    """(K^{-1} rhs, log det K) via the configured engine; NaN-propagating."""
    if _engine_for(K, rhs) == "mixed":
        from gpmp_tpu.ops.mixed import (
            is_fwd_mode_error,
            mp_solve_and_logdet,
            mp_solve_and_logdet_fwdmode,
        )

        try:
            return mp_solve_and_logdet(K, rhs)
        except TypeError as e:
            if not is_fwd_mode_error(e):
                raise
            _log_fwdmode_retry()
            return mp_solve_and_logdet_fwdmode(K, rhs)
    X, C = gnp.cholesky_solve(K, rhs)
    return X, 2.0 * jnp.sum(jnp.log(jnp.diag(C)))


def engine_cholesky_solve(K, rhs):
    """K^{-1} rhs via the configured engine (no logdet)."""
    if _engine_for(K, rhs) == "mixed":
        from gpmp_tpu.ops.mixed import (
            is_fwd_mode_error,
            refined_solve,
            refined_solve_fwdmode,
        )

        try:
            return refined_solve(K, rhs)
        except TypeError as e:
            if not is_fwd_mode_error(e):
                raise
            _log_fwdmode_retry()
            return refined_solve_fwdmode(K, rhs)
    X, _C = gnp.cholesky_solve(K, rhs)
    return X


def engine_solve_and_inv_diag(K, rhs):
    """(K^{-1} rhs, diag(K^{-1})) via the configured engine.

    The f64 path pays an n-RHS triangular solve (the slowest primitive
    on TPU); the mixed engine gets the diagonal from its series
    expansion at matmul cost (ops/mixed.py: mp_solve_and_inv_diag).
    """
    if _engine_for(K, rhs) == "mixed":
        from gpmp_tpu.ops.mixed import mp_solve_and_inv_diag

        return mp_solve_and_inv_diag(K, rhs)
    X, C = gnp.cholesky_solve(K, rhs)
    return X, diag_Kinv_from_chol(C)


def diag_Kinv_from_chol(C, lower: bool = True):
    """diag(K^{-1}) from a Cholesky factor C of K (reference linalg.py:17-46).

    With K = C C^T (C lower), K^{-1} = C^{-T} C^{-1}; letting T = C^{-1},
    diag(K^{-1}) is the columnwise sum of squares of T.
    """
    n = C.shape[0]
    T = gnp.solve_triangular(C, jnp.eye(n, dtype=C.dtype), lower=lower)
    if lower:
        return jnp.sum(T * T, axis=0)
    return jnp.sum(T * T, axis=1)


def compute_contrast_matrix(P):
    """W whose columns span Null(P^T), from a complete QR of P."""
    n, q = P.shape
    Q, _R = gnp.qr(P, mode="complete")
    return Q[:, q:n]


def compute_contrast_covariance(W, K):
    """G = W^T (K W): covariance of the contrasts W^T z for z ~ N(0, K)."""
    return gnp.matmul(W.T, gnp.matmul(K, W))


def qr_nullspace(P):
    """(Q1, W, Rq): Col(P) basis, Null(P^T) basis, leading R block."""
    Q, R = gnp.qr(P, mode="complete")
    q = P.shape[1]
    return Q[:, :q], Q[:, q:], R[:q, :q]


def norm_k_sqrd_with_zero_mean(model, xi, zi, covparam):
    """z^T K^{-1} z for zero-mean models."""
    K = model.covariance(xi, xi, covparam)
    Kinv_zi = engine_cholesky_solve(K, zi)
    return gnp.einsum("i..., i...", zi, Kinv_zi)


def k_inverses(model, xi, zi, covparam):
    """(z^T K^{-1} z, K^{-1} 1, K^{-1} z) via one Cholesky (the reference
    forms the explicit inverse, linalg.py:121-129; we solve instead)."""
    K = model.covariance(xi, xi, covparam)
    zi_col = zi.reshape(-1, 1)
    ones_col = jnp.ones_like(zi_col)
    rhs = jnp.concatenate([zi_col, ones_col], axis=1)
    sol = engine_cholesky_solve(K, rhs)
    Kinv_zi = sol[:, 0].reshape(zi.shape)
    Kinv_1 = sol[:, 1].reshape(zi.shape)
    zTKinvz = gnp.einsum("i..., i...", zi, Kinv_zi)
    return zTKinvz, Kinv_1, Kinv_zi


def norm_k_sqrd(model, xi, zi, covparam):
    """(Wz)^T (W^T K W)^{-1} (Wz) for linear_predictor models.

    Mixed engine: equals z^T Qinv z with
    Qinv = K^{-1} - K^{-1}P (P'K^{-1}P)^{-1} P'K^{-1} (K PD), so one
    engine solve with 1+q RHS replaces the complete n x n QR + contrast
    solve; the f64 path keeps the CPD-safe contrast formulation.
    """
    K = model.covariance(xi, xi, covparam)
    P = model.mean(xi, model.meanparam)

    if _engine_for(K, zi) == "mixed":
        rhs = jnp.concatenate([zi.reshape(-1, 1), P], axis=1)
        A = engine_cholesky_solve(K, rhs)
        a, U = A[:, 0], A[:, 1:]  # K^{-1}z, K^{-1}P
        F = gnp.matmul(P.T, U)
        Fc = jnp.linalg.cholesky(F)
        Pta = gnp.matmul(P.T, a.reshape(-1, 1))
        w = gnp.solve_triangular(Fc, Pta, lower=True)
        return (
            gnp.einsum("i..., i...", zi.reshape(-1), a)
            - jnp.sum(w * w)
        ).reshape(())

    W = compute_contrast_matrix(P)
    Wzi = gnp.matmul(W.T, zi)
    G = compute_contrast_covariance(W, K)
    WKWinv_Wzi, _ = gnp.cholesky_solve(G, Wzi)
    return gnp.einsum("i..., i...", Wzi, WKWinv_Wzi)
