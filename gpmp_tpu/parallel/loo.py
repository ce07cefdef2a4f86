# gpmp_tpu/parallel/loo.py
"""Sharded large-n leave-one-out (virtual) cross-validation.

Same results as core/loo.py (reference semantics
/root/reference/gpmp/core/loo.py:65-130) with the n x n work running
through the distributed blocked Cholesky.  For the linear-predictor
mean the projected-precision identity is used instead of the
contrast-space QR (equivalent for PD K):

  Q^{-1}       = K^{-1} - B Mq^{-1} B',   B = K^{-1} P,  Mq = P' K^{-1} P
  e_i          = (Q^{-1} z)_i / (Q^{-1})_ii
  sigma2_loo,i = 1 / (Q^{-1})_ii

diag(K^{-1}) comes from the explicit triangular inverse
M = L^{-1} (one blocked solve with identity right-hand side, carries
row-sharded over the mesh): diag(K^{-1})_i = sum_k M[k, i]^2.
"""

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .chol import blocked_solve_lower, blocked_solve_upper_t, sharded_cholesky
from .likelihood import sharded_covariance


def sharded_loo(model, xi, zi, mesh, axis_name="shard", block=256):
    """(zloo, sigma2loo, eloo) with the covariance sharded over the mesh."""
    xi = gnp.asarray(xi)
    zi = gnp.asarray(zi).reshape(-1)

    if model.meantype == "zero":
        return _sharded_loo_zero_mean(model, xi, zi, mesh, axis_name, block)
    if model.meantype == "parameterized":
        zi_prior_mean = model.mean(xi, model.meanparam).reshape(-1)
        zloo_c, sigma2loo, eloo = _sharded_loo_zero_mean(
            model, xi, zi - zi_prior_mean, mesh, axis_name, block
        )
        return zloo_c + zi_prior_mean, sigma2loo, eloo
    if model.meantype == "linear_predictor":
        return _sharded_loo_linear_predictor(
            model, xi, zi, mesh, axis_name, block
        )
    raise ValueError(f"Invalid meantype {model.meantype}.")


def _sharded_kinv_parts(model, xi, zi, mesh, axis_name, block, extra_rhs=None):
    """(K^{-1} [z | extra], diag(K^{-1})) via the distributed factor."""
    n = xi.shape[0]
    K = sharded_covariance(model, model.covparam, xi, mesh,
                           axis_name=axis_name)
    L = sharded_cholesky(K, mesh, axis_name=axis_name, block=block)
    rhs = zi.reshape(-1, 1)
    if extra_rhs is not None:
        rhs = jnp.concatenate([rhs, extra_rhs], axis=1)
    y = blocked_solve_lower(L, rhs, block=block, mesh=mesh,
                            axis_name=axis_name)
    X = blocked_solve_upper_t(L, y, block=block, mesh=mesh,
                              axis_name=axis_name)
    # M = L^{-1} row-sharded; diag(K^{-1}) = columnwise sum of squares
    M = blocked_solve_lower(L, jnp.eye(n, dtype=K.dtype), block=block,
                            mesh=mesh, axis_name=axis_name)
    diag_kinv = jnp.einsum("ki,ki->i", M, M)
    return X, diag_kinv


def _sharded_loo_zero_mean(model, xi, zi, mesh, axis_name, block):
    X, diag_kinv = _sharded_kinv_parts(model, xi, zi, mesh, axis_name, block)
    kinv_z = X[:, 0]
    eloo = kinv_z / diag_kinv
    sigma2loo = 1.0 / diag_kinv
    return zi - eloo, sigma2loo, eloo


def _sharded_loo_linear_predictor(model, xi, zi, mesh, axis_name, block):
    P = model.mean(xi, model.meanparam)
    X, diag_kinv = _sharded_kinv_parts(
        model, xi, zi, mesh, axis_name, block, extra_rhs=P
    )
    kinv_z = X[:, 0]
    B = X[:, 1:]  # K^{-1} P, (n, q)
    Mq = P.T @ B
    Cm = jnp.linalg.cholesky(Mq)
    # V = Mq^{-1} B'  -> (q, n);  diag(Q^{-1}) = diag(K^{-1}) - sum_j B V'
    V = gnp.solve_triangular(
        Cm.T, gnp.solve_triangular(Cm, B.T, lower=True), lower=False
    )
    diag_q = diag_kinv - jnp.einsum("iq,qi->i", B, V)
    q_z = kinv_z - B @ (V @ zi)
    eloo = q_z / diag_q
    sigma2loo = 1.0 / diag_q
    return zi - eloo, sigma2loo, eloo
