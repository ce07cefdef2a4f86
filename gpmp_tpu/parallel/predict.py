# gpmp_tpu/parallel/predict.py
"""Sharded large-n GP prediction over a device mesh.

Same mathematics as core/kriging.py (reference semantics
/root/reference/gpmp/core/kriging.py:35-199) in the spd_schur form, with
the (n, n) training covariance row-sharded and solved by the distributed
blocked Cholesky -- so predictions from n beyond single-chip HBM work
without approximation.  Dispatch on model.meantype mirrors
core/kriging.select_predictor (reference kriging.py:119-164).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

import gpmp_tpu.num as gnp
from .chol import blocked_solve_lower, blocked_solve_upper_t, sharded_cholesky
from .likelihood import sharded_covariance


def sharded_cross_covariance(model, covparam, xi, xt, mesh, axis_name="shard"):
    """K(xi, xt) with rows sharded like the training covariance."""
    n = xi.shape[0]
    n_dev = mesh.shape[axis_name]
    if n % n_dev != 0:
        raise ValueError("n must be divisible by the mesh axis size")

    def per_shard(x_loc, xt_full, covparam):
        return model.covariance(x_loc, xt_full, covparam)

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=P(axis_name),
    )
    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return f(
        jax.device_put(xi, shard), jax.device_put(xt, repl), covparam
    )


def sharded_kriging_weights(model, xi, xt, mesh, axis_name="shard",
                            block=256):
    """Kriging weights lambda_t (n, nt) with K row-sharded: feed these to
    core.sample_paths.conditional_sample_paths for large-n conditional
    simulation (reference workflow: kriging.py return_type=-1 +
    sample_paths.py:66-119)."""
    xi = gnp.asarray(xi)
    xt = gnp.asarray(xt)
    covparam = model.covparam
    K = sharded_covariance(model, covparam, xi, mesh, axis_name=axis_name)
    Kit = sharded_cross_covariance(model, covparam, xi, xt, mesh,
                                   axis_name=axis_name)
    L = sharded_cholesky(K, mesh, axis_name=axis_name, block=block)

    def ksolve(B):
        y = blocked_solve_lower(L, B, block=block, mesh=mesh,
                                axis_name=axis_name)
        return blocked_solve_upper_t(L, y, block=block, mesh=mesh,
                                     axis_name=axis_name)

    if model.meantype in ("zero", "parameterized"):
        return ksolve(Kit)
    if model.meantype != "linear_predictor":
        raise ValueError(f"Invalid meantype {model.meantype}.")
    Pd = model.mean(xi, model.meanparam)
    Pt = model.mean(xt, model.meanparam)
    rhs = jnp.concatenate([Kit, Pd], axis=1)
    X = ksolve(rhs)
    Kinv_Kit = X[:, : Kit.shape[1]]
    Kinv_P = X[:, Kit.shape[1]:]
    M = Pd.T @ Kinv_P
    Cm = jnp.linalg.cholesky(M)
    resid = Pd.T @ Kinv_Kit - Pt.T
    mu = gnp.solve_triangular(
        Cm.T, gnp.solve_triangular(Cm, resid, lower=True), lower=False
    )
    return Kinv_Kit - Kinv_P @ mu


def sharded_sample_paths(model, xt, nb_paths, mesh, axis_name="shard",
                         block=256, key=None):
    """nb_paths unconditional draws from GP(0, k) on xt with the (nt, nt)
    covariance row-sharded and factored by the distributed blocked
    Cholesky (reference sample_paths.py:45-63 semantics, chol method)."""
    import jax as _jax

    xt = gnp.asarray(xt)
    K = sharded_covariance(model, model.covparam, xt, mesh,
                           axis_name=axis_name)
    L = sharded_cholesky(K, mesh, axis_name=axis_name, block=block)
    if key is None:
        eps = gnp.randn(K.shape[0], nb_paths)
    else:
        eps = _jax.random.normal(key, (K.shape[0], nb_paths), dtype=K.dtype)
    return L @ eps


def sharded_predict(model, xi, zi, xt, mesh, axis_name="shard", block=256,
                    convert_out=False, factor=None):
    """(zt_posterior_mean, zt_posterior_variance) with the training
    covariance sharded over the mesh.

    Matches model.predict (posterior mean via kriging weights, pairwise
    posterior variance) for 'zero', 'parameterized' and
    'linear_predictor' mean types; the n x n work runs through
    sharded_cholesky + blocked solves.

    factor: a previously computed distributed Cholesky factor of the
    training covariance (sharded_cholesky's L) -- predict-after-fit
    then skips the O(n^3) refactorization and costs only the blocked
    solves.
    """
    xi = gnp.asarray(xi)
    zi = gnp.asarray(zi).reshape(-1)
    xt = gnp.asarray(xt)
    covparam = model.covparam

    if factor is not None:
        # the factorization's covparam-dependence is frozen in `factor`:
        # a covparam gradient through this path would keep the
        # cross-covariance term but silently drop the factor term.
        # Error under autodiff of covparam instead (ADVICE r3).
        from .chol import value_only_wrt

        xi = value_only_wrt(xi, jnp.asarray(covparam))
    Kit = sharded_cross_covariance(model, covparam, xi, xt, mesh,
                                   axis_name=axis_name)
    if factor is None:
        K = sharded_covariance(model, covparam, xi, mesh,
                               axis_name=axis_name)
        L = sharded_cholesky(K, mesh, axis_name=axis_name, block=block)
    else:
        L = factor

    def ksolve(B):
        y = blocked_solve_lower(L, B, block=block, mesh=mesh,
                                axis_name=axis_name)
        return blocked_solve_upper_t(L, y, block=block, mesh=mesh,
                                     axis_name=axis_name)

    zt_prior_var = model.covariance(xt, None, covparam, pairwise=True)

    if model.meantype in ("zero", "parameterized"):
        zi_c = zi
        zt_prior_mean = 0.0
        if model.meantype == "parameterized":
            zi_c = zi - model.mean(xi, model.meanparam).reshape(-1)
            zt_prior_mean = model.mean(xt, model.meanparam).reshape(-1)
        lam = ksolve(Kit)
        zpm = zt_prior_mean + jnp.einsum("ij,i->j", lam, zi_c)
        zpv = zt_prior_var - jnp.einsum("ij,ij->j", lam, Kit)
        return _maybe_numpy(zpm, zpv, convert_out)

    if model.meantype != "linear_predictor":
        raise ValueError(f"Invalid meantype {model.meantype}.")

    # universal kriging, Schur-complement route (core/kriging.py spd_schur)
    Pd = model.mean(xi, model.meanparam)
    Pt = model.mean(xt, model.meanparam)
    q = Pd.shape[1]
    rhs = jnp.concatenate([Kit, Pd], axis=1)
    X = ksolve(rhs)
    Kinv_Kit = X[:, : Kit.shape[1]]
    Kinv_P = X[:, Kit.shape[1]:]
    M = Pd.T @ Kinv_P  # (q, q)
    Cm = jnp.linalg.cholesky(M)
    resid = Pd.T @ Kinv_Kit - Pt.T
    mu = gnp.solve_triangular(
        Cm.T, gnp.solve_triangular(Cm, resid, lower=True), lower=False
    )
    lam = Kinv_Kit - Kinv_P @ mu
    zpm = jnp.einsum("ij,i->j", lam, zi)
    zpv = zt_prior_var - jnp.einsum("ij,ij->j", lam, Kit) - jnp.einsum(
        "ij,ij->j", mu, Pt.T
    )
    return _maybe_numpy(zpm, zpv, convert_out)


def _maybe_numpy(zpm, zpv, convert_out):
    if convert_out:
        import numpy as np

        return np.asarray(zpm), np.asarray(zpv)
    return zpm, zpv
