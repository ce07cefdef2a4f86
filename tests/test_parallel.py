# tests/test_parallel.py
"""Mesh-layer tests on the virtual 8-device CPU mesh: data-parallel
batched criterion equals the serial reference semantics; sharded gram
equals the dense gram."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.core import likelihood
from gpmp_tpu.parallel import (
    make_data_parallel_criterion,
    make_mesh,
    shard_batches,
    sharded_gram,
    sharded_matvec,
)


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, 3, covparam, pairwise)


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_data_parallel_criterion_matches_serial():
    mesh = make_mesh(8, axis_name="batch")
    model = gp.Model(constant_mean, kernel)

    rng = np.random.default_rng(0)
    n_batches, b, d = 8, 8, 2
    x = rng.uniform(size=(n_batches * b, d))
    z = np.sin(3 * x[:, 0]) + 0.5 * np.cos(5 * x[:, 1])
    p0 = gnp.asarray(np.array([0.1, np.log(2.0), np.log(2.0)]))

    xb, zb = shard_batches(x, z, n_batches, mesh=mesh, axis_name="batch")

    def reml_batch(p, xs, zs):
        return likelihood.negative_log_restricted_likelihood(model, p, xs, zs)

    vg = make_data_parallel_criterion(reml_batch, mesh, axis_name="batch")
    v, g = vg(p0, xb, zb)

    # serial oracle: batch-size-weighted mean over per-batch criteria
    vals = [
        float(reml_batch(p0, gnp.asarray(x[i * b:(i + 1) * b]),
                         gnp.asarray(z[i * b:(i + 1) * b])))
        for i in range(n_batches)
    ]
    v_ref = float(np.mean(vals))
    np.testing.assert_allclose(float(v), v_ref, rtol=1e-10)

    # gradient oracle via serial autodiff
    def serial_total(p):
        tot = 0.0
        for i in range(n_batches):
            tot = tot + reml_batch(p, gnp.asarray(x[i * b:(i + 1) * b]),
                                   gnp.asarray(z[i * b:(i + 1) * b]))
        return tot / n_batches

    g_ref = jax.grad(serial_total)(p0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-8)


def test_sharded_gram_matches_dense():
    mesh = make_mesh(8, axis_name="shard")
    rng = np.random.default_rng(1)
    n, d = 64, 3
    x = gnp.asarray(rng.uniform(size=(n, d)))
    p = gnp.asarray(np.array([0.2, 0.1, -0.1, 0.3]))

    cov_cross = lambda xr, yc, pp: gp.kernel.maternp_covariance_it(xr, yc, 3, pp)
    K = sharded_gram(cov_cross, x, p, mesh, axis_name="shard")
    K_ref = gp.kernel.maternp_covariance_it(x, x, 3, p)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), rtol=1e-12)

    v = gnp.asarray(rng.normal(size=(n,)))
    y = sharded_matvec(K, v, mesh, axis_name="shard")
    np.testing.assert_allclose(np.asarray(y), np.asarray(K_ref @ v), rtol=1e-10)


def test_shard_batches_validation():
    mesh = make_mesh(8, axis_name="batch")
    x = np.zeros((20, 2))
    z = np.zeros(20)
    with pytest.raises(ValueError):
        shard_batches(x, z, 6, mesh=mesh)  # 6 not divisible by 8
