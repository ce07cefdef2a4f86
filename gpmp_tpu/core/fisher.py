# gpmp_tpu/core/fisher.py
"""Fisher information for covariance parameters.

Reference semantics: /root/reference/gpmp/core/fisher.py:18-191.
TPU design delta: the covariance derivatives dK/dtheta_i come from forward-
mode autodiff (jax.jacfwd) instead of 5-point finite differences -- exact,
one compiled pass, and differentiable.  The ``epsilon`` argument is kept
for API compatibility and used only by the explicit finite-difference
variants (suffix ``_fd``) retained as parity oracles.
"""

import jax
import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .linalg import compute_contrast_matrix


def _dK_stack(model, xi, theta):
    """dK/dtheta as a (p, n, n) stack via forward-mode autodiff."""
    jac = jax.jacfwd(lambda t: model.covariance(xi, xi, t))(theta)
    # jac has shape (n, n, p); move parameter axis first
    return jnp.moveaxis(jac, -1, 0)


def fisher_information(model, xi, covparam=None, epsilon=1e-3):
    """I_ij = 0.5 Tr(K^{-1} dK_i K^{-1} dK_j) with exact autodiff dK."""
    theta = model.covparam if covparam is None else gnp.asarray(covparam)
    K = model.covariance(xi, xi, theta)
    dK = _dK_stack(model, xi, theta)  # (p, n, n)
    # S_i = K^{-1} dK_i via Cholesky solves, batched over parameters
    C = jnp.linalg.cholesky(K)
    def ksolve(A):
        y = gnp.solve_triangular(C, A, lower=True)
        return gnp.solve_triangular(C.T, y, lower=False)
    S = jax.vmap(ksolve)(dK)  # (p, n, n)
    # I_ij = 0.5 Tr(S_i S_j) = 0.5 <S_i, S_j^T>
    return 0.5 * jnp.einsum("iab,jba->ij", S, S)


def fisher_information_cpd(model, xi, covparam=None, epsilon=1e-3):
    """Fisher information in contrast space G = W'KW when the mean is a
    linear predictor; SPD formula on K otherwise."""
    theta = model.covparam if covparam is None else gnp.asarray(covparam)
    if model.meantype != "linear_predictor":
        return fisher_information(model, xi, covparam=theta, epsilon=epsilon)

    K = model.covariance(xi, xi, theta)
    P = model.mean(xi, model.meanparam)
    W = compute_contrast_matrix(P)
    G = W.T @ (K @ W)
    dK = _dK_stack(model, xi, theta)
    dG = jnp.einsum("ar,iab,bs->irs", W, dK, W)  # W' dK_i W
    C = jnp.linalg.cholesky(G)
    def gsolve(A):
        y = gnp.solve_triangular(C, A, lower=True)
        return gnp.solve_triangular(C.T, y, lower=False)
    S = jax.vmap(gsolve)(dG)
    return 0.5 * jnp.einsum("iab,jba->ij", S, S)


def fisher_information_torch(model, xi, covparam):
    """0.5 * Hessian of log|K(theta)| (name kept for reference API parity;
    implemented with jax.hessian, reference fisher.py:154-191)."""
    xi_ = gnp.asarray(xi)

    def log_det_cov(params):
        K = model.covariance(xi_, xi_, params)
        L = jnp.linalg.cholesky(K)
        return 2.0 * jnp.sum(jnp.log(jnp.diag(L)))

    H = jax.hessian(log_det_cov)(gnp.asarray(covparam))
    return 0.5 * H


def fisher_information_fd(model, xi, covparam=None, epsilon=1e-3):
    """Finite-difference variant (reference fisher.py:18-78), parity oracle."""
    import numpy as onp

    theta = onp.asarray(model.covparam if covparam is None else covparam)
    p = theta.shape[0]
    K = model.covariance(xi, xi, gnp.asarray(theta))
    K_inv = gnp.cholesky_inv(K)
    dK = []
    for i in range(p):
        def f(tmp_val, i=i):
            t = theta.copy()
            t[i] = tmp_val
            return model.covariance(xi, xi, gnp.asarray(t))
        dK.append(gnp.derivative_finite_diff(f, theta[i], epsilon))
    I = onp.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            term = 0.5 * jnp.trace(K_inv @ dK[i] @ K_inv @ dK[j])
            I[i, j] = I[j, i] = float(term)
    return jnp.asarray(I)
