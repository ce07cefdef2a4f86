# gpmp_tpu/core/likelihood.py
"""Negative (restricted) log-likelihoods, jit/grad-safe.

Reference semantics: /root/reference/gpmp/core/likelihood.py:18-129.
TPU design deltas:

- Failure handling: a non-PD covariance yields NaNs from Cholesky inside
  jit (no exception); the NLL then evaluates to NaN, which we convert to
  +inf with ``jnp.where`` -- the jit-compatible analogue of the
  exception -> safe_inf path in the reference (likelihood.py:45-48).
- REML has two implementations:
  * 'profiled' (default): the mean is profiled out analytically,
      L = 0.5 [ (n-q) log 2pi + log|K| + log|P'K^{-1}P| - log|P'P| + quad ],
    needing only one n x n Cholesky + a triangular solve with (q+1) RHS.
    This avoids the reference's complete n x n QR + two n^3 matmuls
    (likelihood.py:116-120) -- the dominant cost on TPU.
  * 'contrast': the reference's contrast-space formula (kept for CPD
    kernels where K itself is not PD, and as a cross-check oracle).
  Both agree to ~1e-10 relative for PD kernels (tested).
"""

from math import log, pi

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .linalg import (
    compute_contrast_covariance,
    compute_contrast_matrix,
    solve_and_logdet as _solve_and_logdet,
)


def _nan_to_inf(L):
    return jnp.where(jnp.isnan(L), jnp.asarray(jnp.inf, dtype=L.dtype), L)


def negative_log_likelihood_zero_mean(model, covparam, xi, zi):
    """NLL of zi ~ N(0, K(covparam)); +inf if K is not PD."""
    K = model.covariance(xi, xi, covparam)
    n = K.shape[0]
    Kinv_zi, ldetK = _solve_and_logdet(K, zi)
    norm2 = gnp.einsum("i..., i...", zi, Kinv_zi)
    L = 0.5 * (n * log(2.0 * pi) + ldetK + norm2)
    return _nan_to_inf(L.reshape(()))


def negative_log_likelihood(model, meanparam, covparam, xi, zi):
    """NLL with a parameterized mean: center then zero-mean NLL."""
    zi_prior_mean = model.mean(xi, meanparam).reshape(-1)
    centered_zi = zi - zi_prior_mean
    return negative_log_likelihood_zero_mean(model, covparam, xi, centered_zi)


def _reml_profiled(model, covparam, xi, zi):
    """REML via analytic profiling of the linear-predictor mean."""
    K = model.covariance(xi, xi, covparam)
    P = model.mean(xi, model.meanparam)
    n, q = P.shape
    rhs = jnp.concatenate([zi.reshape(-1, 1), P], axis=1)
    X, ldetK = _solve_and_logdet(K, rhs)  # K^{-1} [z P]
    Kinv_z = X[:, 0]
    Kinv_P = X[:, 1:]
    M = P.T @ Kinv_P  # P' K^{-1} P (q x q, tiny)
    Cm = jnp.linalg.cholesky(M)
    b = P.T @ Kinv_z
    u = gnp.solve_triangular(Cm, b, lower=True)
    quad = zi @ Kinv_z - u @ u
    ldetM = 2.0 * jnp.sum(jnp.log(jnp.diag(Cm)))
    # P'P is SPD for a full-column-rank design; Cholesky logdet (LU-free)
    ldetPtP = gnp.logdet(P.T @ P)
    L = 0.5 * ((n - q) * log(2.0 * pi) + ldetK + ldetM - ldetPtP + quad)
    return _nan_to_inf(L.reshape(()))


def _reml_contrast(model, covparam, xi, zi):
    """REML in contrast space (reference likelihood.py:92-129 formula)."""
    K = model.covariance(xi, xi, covparam)
    P = model.mean(xi, model.meanparam)
    W = compute_contrast_matrix(P)
    Wzi = gnp.matmul(W.T, zi)
    G = compute_contrast_covariance(W, K)
    WKWinv_Wzi, C = gnp.cholesky_solve(G, Wzi)
    norm2 = gnp.einsum("i..., i...", Wzi, WKWinv_Wzi)
    ldetWKW = 2.0 * jnp.sum(jnp.log(jnp.diag(C)))
    n, q = P.shape
    L = 0.5 * ((n - q) * log(2.0 * pi) + ldetWKW + norm2)
    return _nan_to_inf(L.reshape(()))


def negative_log_restricted_likelihood(model, covparam, xi, zi, impl="profiled"):
    """Negative restricted (REML) log-likelihood.

    impl='profiled' (fast TPU path, one Cholesky) or 'contrast'
    (reference contrast-space formula; required for CPD kernels).
    """
    if impl == "profiled":
        return _reml_profiled(model, covparam, xi, zi)
    if impl == "contrast":
        return _reml_contrast(model, covparam, xi, zi)
    raise ValueError("impl must be 'profiled' or 'contrast'")
