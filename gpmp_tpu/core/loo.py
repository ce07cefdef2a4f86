# gpmp_tpu/core/loo.py
"""Leave-one-out (virtual cross-validation) predictions, jit-safe.

Reference semantics: /root/reference/gpmp/core/loo.py:21-162.
"""

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .linalg import _engine_for, chol_engine, engine_solve_and_inv_diag


def loo(model, xi, zi):
    """LOO predictions/variances/errors for the model's meantype."""
    if model.meantype == "zero":
        return _loo_with_zero_mean(model, model.covparam, xi, zi)
    elif model.meantype == "parameterized":
        return _loo_with_parameterized_mean(
            model, model.meanparam, model.covparam, xi, zi
        )
    elif model.meantype == "linear_predictor":
        return _loo_with_linear_predictor_mean_cpd(
            model, model.meanparam, model.covparam, xi, zi
        )
    else:
        raise ValueError(f"Unknown mean type: {model.meantype}")


def _loo_with_zero_mean(model, covparam, xi, zi):
    """e_i = (K^{-1} z)_i / (K^{-1})_ii ; sigma2_i = 1/(K^{-1})_ii."""
    K = model.covariance(xi, xi, covparam)
    Kinv_zi, Kinvdiag = engine_solve_and_inv_diag(K, zi)
    Kinv_zi = Kinv_zi.reshape(zi.shape)
    eloo = Kinv_zi.reshape(-1) / Kinvdiag
    sigma2loo = 1.0 / Kinvdiag
    zloo = zi - eloo
    return zloo, sigma2loo, eloo


def _loo_with_parameterized_mean(model, meanparam, covparam, xi, zi):
    zi_prior_mean = model.mean(xi, meanparam).reshape(-1)
    centered_zi = zi - zi_prior_mean
    zloo_centered, sigma2loo, eloo_centered = _loo_with_zero_mean(
        model, covparam, xi, centered_zi
    )
    zloo = zloo_centered + zi_prior_mean
    return zloo, sigma2loo, eloo_centered


def _loo_with_linear_predictor_mean_cpd(model, meanparam, covparam, xi, zi):
    """Contrast-space LOO: Qinv = W (W'KW)^{-1} W'; CPD-safe
    (reference loo.py:103-130).

    Under the mixed engine K must be PD anyway, so the complete n x n
    QR + contrast solve is replaced by the profiled projector identity
    Qinv = K^{-1} - K^{-1}P (P'K^{-1}P)^{-1} P'K^{-1} -- one engine
    solve with (1+q) RHS plus O(nq^2) work.
    """
    K = model.covariance(xi, xi, covparam)
    P = model.mean(xi, meanparam)

    if _engine_for(K, zi) == "mixed":
        q = P.shape[1]
        rhs = jnp.concatenate([zi.reshape(-1, 1), P], axis=1)
        A, diagKinv = engine_solve_and_inv_diag(K, rhs)
        a, U = A[:, 0], A[:, 1:]  # K^{-1}z, K^{-1}P
        F = gnp.matmul(P.T, U)  # (q, q), PD for full-rank P
        Fc = jnp.linalg.cholesky(F)
        T = gnp.solve_triangular(Fc, U.T, lower=True)  # (q, n)
        Qinvdiag = diagKinv - jnp.sum(T * T, axis=0)
        Pta = gnp.matmul(P.T, a.reshape(-1, 1))
        w = gnp.solve_triangular(
            Fc.T, gnp.solve_triangular(Fc, Pta, lower=True), lower=False
        )
        Qinvzi = a - gnp.matmul(U, w).reshape(-1)
        eloo = Qinvzi / Qinvdiag
        sigma2loo = 1.0 / Qinvdiag
        zloo = zi - eloo
        return zloo, sigma2loo, eloo

    Q, _R = gnp.qr(P, mode="complete")
    W = Q[:, P.shape[1]:]
    G = gnp.matmul(W.T, gnp.matmul(K, W))

    S, _ = gnp.cholesky_solve(G, W.T)  # G^{-1} W^T, (n-q, n)
    Qinvzi = gnp.matmul(W, gnp.matmul(S, zi))
    Qinvdiag = jnp.sum(W * S.T, axis=1)

    eloo = Qinvzi / Qinvdiag
    sigma2loo = 1.0 / Qinvdiag
    zloo = zi - eloo
    return zloo, sigma2loo, eloo
