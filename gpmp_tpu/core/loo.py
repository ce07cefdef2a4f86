# gpmp_tpu/core/loo.py
"""Leave-one-out (virtual cross-validation) predictions, jit-safe.

Reference semantics: /root/reference/gpmp/core/loo.py:21-162.
"""

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .linalg import diag_Kinv_from_chol


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
    Kinv_zi, C = gnp.cholesky_solve(K, zi)
    Kinvdiag = diag_Kinv_from_chol(C)
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
    (reference loo.py:103-130)."""
    K = model.covariance(xi, xi, covparam)
    P = model.mean(xi, meanparam)

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
