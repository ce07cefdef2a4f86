# gpmp_tpu/core/sample_paths.py
"""GP sample paths: unconditional draws + conditioning by kriging.

Reference semantics: /root/reference/gpmp/core/sample_paths.py:18-183.
RNG: draws use the module-level PRNG key shim (gnp.randn) for UX parity;
pass ``key=`` for explicit functional randomness.
"""

import jax
import jax.numpy as jnp

import gpmp_tpu.num as gnp


def sample_paths(model, xt, nb_paths, method="chol", check_result=True, key=None):
    """nb_paths draws from GP(0, k) on xt; factorization 'chol' or 'svd'."""
    xt_ = gnp.asarray(xt)
    K = model.covariance(xt_, xt_, model.covparam)

    if method == "chol":
        from .linalg import chol_engine

        if chol_engine(K.shape[0]) == "mixed":
            from gpmp_tpu.ops.refine import sampling_sqrt

            # non-triangular square root, C C^T = K to ~1e-9: any such
            # factor draws from the same law, at 4 f64-matmul cost
            C = sampling_sqrt(K)
            # cond(K) beyond the f32 dynamic range (dense interpolation
            # grids): fall back to the emulated-f64 factorization, which
            # survives where the f32 preconditioner cannot.  This path
            # already host-syncs for the NaN check below.
            if bool(jnp.any(jnp.isnan(C))):
                C = jnp.linalg.cholesky(K)
        else:
            C = jnp.linalg.cholesky(K)
        if check_result and bool(jnp.any(jnp.isnan(C))):
            raise AssertionError(
                "Cholesky factorization failed (NaNs). "
                "Consider adding jitter or use method='svd'."
            )
    elif method == "svd":
        U, s, Vt = jnp.linalg.svd(K, full_matrices=True, hermitian=True)
        C = jnp.matmul(U * jnp.sqrt(s), Vt)
    else:
        raise ValueError("method must be 'chol' or 'svd'")

    if key is None:
        eps = gnp.randn(K.shape[0], nb_paths)
    else:
        eps = jax.random.normal(key, (K.shape[0], nb_paths), dtype=K.dtype)
    return jnp.matmul(C, eps)


def conditional_sample_paths(model, ztsim, xi_ind, zi, xt_ind, lambda_t,
                             convert_out=True):
    """Conditioning by kriging: ztsimc = ztsim[xt] + lambda' (zi - ztsim[xi])."""
    zi_ = gnp.asarray(zi).reshape(-1, 1)
    ztsim_ = gnp.asarray(ztsim)
    xi_ind = jnp.asarray(xi_ind, dtype=jnp.int32).reshape(-1)
    xt_ind = jnp.asarray(xt_ind, dtype=jnp.int32).reshape(-1)

    delta = zi_ - ztsim_[xi_ind, :]
    ztsimc = ztsim_[xt_ind, :] + gnp.einsum("ij,ik->jk", lambda_t, delta)

    if convert_out:
        ztsimc = gnp.to_np(ztsimc)
    return ztsimc


def conditional_sample_paths_parameterized_mean(
    model, ztsim, xi, xi_ind, zi, xt, xt_ind, lambda_t, convert_out=True
):
    """Conditioning with a parameterized mean: center, condition, re-add."""
    xi_ = gnp.asarray(xi)
    zi_ = gnp.asarray(zi)
    xt_ = gnp.asarray(xt)
    ztsim_ = gnp.asarray(ztsim)
    xi_ind = jnp.asarray(xi_ind, dtype=jnp.int32).reshape(-1)
    xt_ind = jnp.asarray(xt_ind, dtype=jnp.int32).reshape(-1)

    zi_prior_mean_ = model.mean(xi_, model.meanparam).reshape(-1)
    zi_centered_ = zi_ - zi_prior_mean_
    zt_prior_mean_ = model.mean(xt_, model.meanparam).reshape(-1, 1)

    delta = zi_centered_.reshape(-1, 1) - ztsim_[xi_ind, :]
    ztsimc = (
        ztsim_[xt_ind, :] + gnp.einsum("ij,ik->jk", lambda_t, delta) + zt_prior_mean_
    )

    if convert_out:
        ztsimc = gnp.to_np(ztsimc)
    return ztsimc
