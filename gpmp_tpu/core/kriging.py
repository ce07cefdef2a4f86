# gpmp_tpu/core/kriging.py
"""Kriging predictors and posterior variances (jit-safe).

Reference semantics: /root/reference/gpmp/core/kriging.py:35-257.
TPU design delta: universal kriging uses the CPD-safe nullspace route
as the *primary* implementation rather than a block-solve with an
exception fallback (kriging.py:105-116).  Inside jit there are no
exceptions to catch; the nullspace route is numerically equivalent for
well-conditioned systems, strictly more robust otherwise, and costs the
same O(n^3).  A 'block' implementation is kept for cross-checking.
"""

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .linalg import engine_cholesky_solve, qr_nullspace


def kriging_predictor_with_zero_mean(model, xi, xt, return_type=0):
    """Simple kriging weights and posterior variance (zero prior mean)."""
    Kii = model.covariance(xi, xi, model.covparam)
    Kit = model.covariance(xi, xt, model.covparam)
    lambda_t = engine_cholesky_solve(Kii, Kit)
    zt_posterior_variance = _compute_posterior_variance(
        model, xt, lambda_t, Kit, return_type
    )
    return lambda_t, zt_posterior_variance


def kriging_predictor(model, xi, xt, return_type=0, method="spd_schur"):
    """Universal kriging weights and posterior variance (linear predictor
    mean).

    method='spd_schur' (default): Schur-complement solution of the
    saddle-point system using Cholesky solves of K only --
      mu     = (P'K^{-1}P)^{-1} (P'K^{-1}K_it - P_t')
      lambda = K^{-1}(K_it - P mu)
    Valid whenever K is PD (always true for kernels with a nugget); no
    n x n QR (which is latency-bound on TPU), and the K-solves go
    through the configured Cholesky engine.

    method='nullspace': CPD-safe contrast-space computation for
    generalized (conditionally positive definite) covariances.
    """
    if method == "nullspace":
        return _kriging_predictor_nullspace(model, xi, xt, return_type)
    return _kriging_predictor_spd_schur(model, xi, xt, return_type)


def _kriging_predictor_spd_schur(model, xi, xt, return_type=0):
    K = model.covariance(xi, xi, model.covparam)
    P = model.mean(xi, model.meanparam)
    ni, q = P.shape
    Kit = model.covariance(xi, xt, model.covparam)
    Pt = model.mean(xt, model.meanparam)

    rhs = jnp.concatenate([Kit, P], axis=1)
    X = engine_cholesky_solve(K, rhs)
    Kinv_Kit = X[:, : Kit.shape[1]]
    Kinv_P = X[:, Kit.shape[1]:]

    M = P.T @ Kinv_P  # (q, q) SPD
    Cm = jnp.linalg.cholesky(M)
    resid = P.T @ Kinv_Kit - Pt.T
    mu = gnp.solve_triangular(
        Cm.T, gnp.solve_triangular(Cm, resid, lower=True), lower=False
    )
    lambda_t = Kinv_Kit - Kinv_P @ mu

    lambdamu_t = jnp.concatenate([lambda_t, mu], axis=0)
    RHS = jnp.vstack((Kit, Pt.T))
    zt_posterior_variance = _compute_posterior_variance(
        model, xt, lambdamu_t, RHS, return_type
    )
    return lambda_t, zt_posterior_variance


def kriging_predictor_block(model, xi, xt, return_type=0):
    """Universal kriging via the saddle-point block system
    [[K, P], [P^T, 0]] [lambda; mu] = [K_it; P_t^T] (reference primary
    path, kriging.py:94-114).  Kept as a cross-check; not jit-robust for
    ill-conditioned systems."""
    Kii = model.covariance(xi, xi, model.covparam)
    Pi = model.mean(xi, model.meanparam)
    ni, q = Pi.shape
    LHS = jnp.vstack(
        (jnp.hstack((Kii, Pi)), jnp.hstack((Pi.T, jnp.zeros((q, q), Kii.dtype))))
    )
    Kit = model.covariance(xi, xt, model.covparam)
    Pt = model.mean(xt, model.meanparam)
    RHS = jnp.vstack((Kit, Pt.T))
    lambdamu_t = gnp.solve(LHS, RHS)
    lambda_t = lambdamu_t[0:ni, :]
    zt_posterior_variance = _compute_posterior_variance(
        model, xt, lambdamu_t, RHS, return_type
    )
    return lambda_t, zt_posterior_variance


def select_predictor(model, xi, zi, xt):
    """Dispatch on model.meantype; returns (zi_centered, zt_prior_mean,
    lambda_t, zt_posterior_variance) as in reference kriging.py:119-164."""
    zt_prior_mean = 0.0
    zi_centered = zi

    if model.meantype == "zero":
        lambda_t, zt_posterior_variance = kriging_predictor_with_zero_mean(
            model, xi, xt, return_type=0
        )
    elif model.meantype == "linear_predictor":
        lambda_t, zt_posterior_variance = kriging_predictor(
            model, xi, xt, return_type=0
        )
    elif model.meantype == "parameterized":
        if model.meanparam is None:
            raise ValueError(
                "For meantype 'parameterized', meanparam should not be None."
            )
        lambda_t, zt_posterior_variance = kriging_predictor_with_zero_mean(
            model, xi, xt, return_type=0
        )
        zi_prior_mean = model.mean(xi, model.meanparam).reshape(-1)
        zi_centered = zi - zi_prior_mean
        zt_prior_mean = model.mean(xt, model.meanparam).reshape(-1)
    else:
        raise ValueError(
            f"Invalid meantype {model.meantype}. "
            "Supported types are 'zero', 'parameterized', and 'linear_predictor'."
        )

    return zi_centered, zt_prior_mean, lambda_t, zt_posterior_variance


def _compute_posterior_variance(model, xt, lambdamu_t, RHS, return_type=0):
    """Posterior variance: prior variance minus explained part."""
    if return_type == -1:
        return None
    elif return_type == 0:
        zt_prior_variance = model.covariance(xt, None, model.covparam, pairwise=True)
        return zt_prior_variance - gnp.einsum("i..., i...", lambdamu_t, RHS)
    elif return_type == 1:
        zt_prior_variance = model.covariance(xt, None, model.covparam, pairwise=False)
        return zt_prior_variance - gnp.matmul(lambdamu_t.T, RHS)
    else:
        raise ValueError("return_type must be in {-1, 0, 1}")


def _kriging_predictor_nullspace(model, xi, xt, return_type=0):
    """CPD-safe universal kriging in contrast space (Null(P^T) basis).

    Exact decomposition of the saddle-point solution lambda = W alpha
    + Q1 beta with [Q1 | W] from a complete QR of P:

      beta  = R_q^{-T} P_t^T                  (unbiasedness P^T lambda = P_t^T)
      alpha = G^{-1} W^T (K_it - K Q1 beta)   (projected optimality,
                                               G = W^T K W SPD)
      mu    = R_q^{-1} Q1^T (K_it - K lambda) (Lagrange multiplier)

    Equal to the block system of reference kriging.py:94-114 for PD K,
    and well-defined for CPD kernels whenever G is PD.  Note: the
    reference's *fallback* (kriging.py:236) drops the K Q1 beta
    cross-term and substitutes beta for mu in the variance; we keep the
    exact solution so the primary path needs no fallback at all.
    """
    K = model.covariance(xi, xi, model.covparam)
    P = model.mean(xi, model.meanparam)
    Kit = model.covariance(xi, xt, model.covparam)
    Pt = model.mean(xt, model.meanparam)

    Q1, W, Rq = qr_nullspace(P)

    KW = gnp.matmul(K, W)
    G = gnp.matmul(W.T, KW)

    beta = gnp.solve_triangular(Rq.T, Pt.T, lower=True)  # (q, m)
    Q1beta = gnp.matmul(Q1, beta)  # (n, m)
    resid = Kit - gnp.matmul(K, Q1beta)
    alpha, _ = gnp.cholesky_solve(G, gnp.matmul(W.T, resid))

    lambda_t = gnp.matmul(W, alpha) + Q1beta

    if return_type == -1:
        return lambda_t, None

    mu = gnp.solve_triangular(
        Rq, gnp.matmul(Q1.T, Kit - gnp.matmul(K, lambda_t)), lower=False
    )
    RHS = jnp.vstack((Kit, Pt.T))
    LM = jnp.vstack((lambda_t, mu))
    if return_type == 0:
        v0 = model.covariance(xt, xt, model.covparam, pairwise=True)
        zt_posterior_variance = v0 - gnp.einsum("i..., i...", LM, RHS)
    elif return_type == 1:
        V0 = model.covariance(xt, xt, model.covparam, pairwise=False)
        zt_posterior_variance = V0 - gnp.matmul(LM.T, RHS)
    else:
        raise ValueError("return_type must be in {-1,0,1}")

    return lambda_t, zt_posterior_variance
