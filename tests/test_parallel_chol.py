# tests/test_parallel_chol.py
"""Distributed blocked Cholesky / sharded REML vs single-device oracles
on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.parallel import (
    make_mesh,
    sharded_cholesky,
    sharded_solve_and_logdet,
    sharded_covariance,
    sharded_negative_log_restricted_likelihood,
    sharded_negative_log_likelihood_zero_mean,
)

N, D, BLOCK = 512, 3, 64


def _spd(n, cond=1e5, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return Q @ np.diag(eigs) @ Q.T


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_name="shard")


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(42)
    xi = rng.uniform(size=(N, D))
    zi = np.sin(3 * xi[:, 0]) + 0.5 * xi[:, 1] + 0.1 * rng.normal(size=N)

    def mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, param, pairwise=False):
        sigma2 = gnp.exp(param[0])
        noise = gnp.exp(param[1])
        loginvrho = param[2:]
        if y is x or y is None:
            if pairwise:
                return (sigma2 + noise) * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(loginvrho, x, x)
            return sigma2 * gp.kernel.maternp_kernel(2, K) + noise * gnp.eye(
                K.shape[0]
            )
        if pairwise:
            K = gnp.scaled_distance_elementwise(loginvrho, x, y)
        else:
            K = gnp.scaled_distance(loginvrho, x, y)
        return sigma2 * gp.kernel.maternp_kernel(2, K)

    model = gp.Model(mean, kernel)
    p0 = gnp.asarray(
        np.concatenate([[np.log(np.var(zi))], [np.log(0.01)],
                        -np.log(np.std(xi, axis=0))])
    )
    return model, gnp.asarray(xi), gnp.asarray(zi), p0


def test_sharded_cholesky_matches_oracle(mesh):
    K = _spd(N, seed=1)
    L = np.asarray(sharded_cholesky(gnp.asarray(K), mesh, block=BLOCK))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=1e-9, atol=1e-11)


def test_sharded_solve_and_logdet(mesh):
    K = _spd(N, seed=2)
    rng = np.random.default_rng(3)
    B = rng.normal(size=(N, 4))
    X, ld = sharded_solve_and_logdet(
        gnp.asarray(K), gnp.asarray(B), mesh, block=BLOCK
    )
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(K, B),
                               rtol=1e-7, atol=1e-9)
    _s, ld_ref = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(ld), ld_ref, rtol=1e-10)


def test_sharded_covariance_matches_model(mesh, problem):
    model, xi, zi, p0 = problem
    K_sh = np.asarray(sharded_covariance(model, p0, xi, mesh))
    K_ref = np.asarray(model.covariance(xi, xi, p0))
    np.testing.assert_allclose(K_sh, K_ref, rtol=1e-12, atol=1e-14)


def test_sharded_reml_matches_core(mesh, problem):
    model, xi, zi, p0 = problem
    v_sh = float(
        sharded_negative_log_restricted_likelihood(
            model, p0, xi, zi, mesh, block=BLOCK
        )
    )
    v_ref = float(model.negative_log_restricted_likelihood(p0, xi, zi))
    np.testing.assert_allclose(v_sh, v_ref, rtol=1e-10)


def test_sharded_reml_gradient(mesh, problem):
    model, xi, zi, p0 = problem

    fn = jax.jit(
        jax.value_and_grad(
            lambda p: sharded_negative_log_restricted_likelihood(
                model, p, xi, zi, mesh, block=BLOCK
            )
        )
    )
    v, g = fn(p0)
    v_ref, g_ref = jax.value_and_grad(
        lambda p: model.negative_log_restricted_likelihood(p, xi, zi)
    )(p0)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-9)


def test_sharded_nll_zero_mean_matches_core(mesh, problem):
    model, xi, zi, p0 = problem
    v_sh = float(
        sharded_negative_log_likelihood_zero_mean(
            model, p0, xi, zi, mesh, block=BLOCK
        )
    )
    v_ref = float(
        gp.kernel.negative_log_likelihood_zero_mean(model, p0, xi, zi)
    )
    np.testing.assert_allclose(v_sh, v_ref, rtol=1e-10)


def test_sharded_predict_matches_model(mesh, problem):
    from gpmp_tpu.parallel import sharded_predict

    model, xi, zi, p0 = problem
    model.covparam = p0
    rng = np.random.default_rng(9)
    xt = gnp.asarray(rng.uniform(size=(64, D)))
    zpm_sh, zpv_sh = sharded_predict(model, xi, zi, xt, mesh, block=BLOCK)
    zpm, zpv = model.predict(xi, zi, xt, convert_out=False)
    np.testing.assert_allclose(np.asarray(zpm_sh), np.asarray(zpm),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(zpv_sh), np.asarray(zpv),
                               rtol=1e-6, atol=1e-10)


def test_sharded_predict_zero_mean(mesh, problem):
    from gpmp_tpu.parallel import sharded_predict
    import gpmp_tpu as gp

    model, xi, zi, p0 = problem
    model_z = gp.Model(None, model.covariance, covparam=p0, meantype="zero")
    rng = np.random.default_rng(10)
    xt = gnp.asarray(rng.uniform(size=(32, D)))
    zpm_sh, zpv_sh = sharded_predict(model_z, xi, zi, xt, mesh, block=BLOCK)
    zpm, zpv = model_z.predict(xi, zi, xt, convert_out=False)
    np.testing.assert_allclose(np.asarray(zpm_sh), np.asarray(zpm),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(zpv_sh), np.asarray(zpv),
                               rtol=1e-6, atol=1e-10)


def test_samplers_accept_mesh_sharding(mesh):
    """MH chains / SVGD+SMC particles sharded over the mesh produce
    correct posterior moments (standard 2-D Gaussian target)."""
    from gpmp_tpu.mcmc.mh import MetropolisHastings, MHOptions
    from gpmp_tpu.mcmc.svgd import svgd_sample, SVGDOptions
    from gpmp_tpu.mcmc.smc import ParticlesSet, ParticlesSetConfig

    def log_target(x):
        return -0.5 * jnp.sum(x**2)

    opts = MHOptions(dim=2, n_chains=16, seed=0, mesh=mesh,
                     mesh_axis_name="shard", init_msg=None)
    mh = MetropolisHastings(log_target, options=opts)
    x = mh.scheduler(np.random.default_rng(0).normal(size=(16, 2)),
                     burnin_period=300, n_steps_total=900)
    s = np.asarray(x)[:, 300:, :].reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(s.std(axis=0), 1.0, atol=0.2)

    o = SVGDOptions(n_steps=150, seed=1, mesh=mesh, mesh_axis_name="shard",
                    verbose=0)
    p, _info = svgd_sample(
        log_target,
        particles_initial=np.random.default_rng(1).normal(size=(64, 2)),
        options=o,
    )
    np.testing.assert_allclose(np.asarray(p).std(axis=0), 1.0, atol=0.35)

    cfg = ParticlesSetConfig(mesh=mesh, mesh_axis_name="shard")
    ps = ParticlesSet([[-5.0, -5.0], [5.0, 5.0]], n=64, config=cfg)
    ps.set_logpdf(lambda x: -0.5 * jnp.sum(x**2, axis=-1))
    ps.reweight()
    assert np.isfinite(np.asarray(ps.w_tmp)).all()

    from gpmp_tpu.mcmc.nuts import nuts_sample, NUTSOptions

    nopts = NUTSOptions(num_warmup=150, seed=0, mesh=mesh,
                        mesh_axis_name="shard", verbose=0, progress=False)
    ns, _info = nuts_sample(
        log_target, np.random.default_rng(2).normal(size=(8, 2)), 300,
        options=nopts,
    )
    ns2 = np.asarray(ns).reshape(-1, 2)
    np.testing.assert_allclose(ns2.std(axis=0), 1.0, atol=0.2)


def test_sharded_loo_matches_core(mesh, problem):
    from gpmp_tpu.parallel import sharded_loo

    model, xi, zi, p0 = problem
    model.covparam = p0
    zloo_sh, s2_sh, e_sh = sharded_loo(model, xi, zi, mesh, block=BLOCK)
    zloo, s2, e = model.loo(xi, zi, convert_out=False)
    np.testing.assert_allclose(np.asarray(zloo_sh), np.asarray(zloo),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s2_sh), np.asarray(s2),
                               rtol=1e-7, atol=1e-10)

    import gpmp_tpu as gp

    model_z = gp.Model(None, model.covariance, covparam=p0, meantype="zero")
    zloo_sh, s2_sh, _ = sharded_loo(model_z, xi, zi, mesh, block=BLOCK)
    zloo, s2, _ = model_z.loo(xi, zi, convert_out=False)
    np.testing.assert_allclose(np.asarray(zloo_sh), np.asarray(zloo),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s2_sh), np.asarray(s2),
                               rtol=1e-7, atol=1e-10)


def test_sharded_conditional_simulation_matches_core(mesh, problem):
    """Large-n conditional simulation: sharded kriging weights + sharded
    unconditional paths fed to core conditional_sample_paths, vs the
    single-device equivalents."""
    from gpmp_tpu.parallel import sharded_kriging_weights, sharded_sample_paths
    from gpmp_tpu.core import kriging, sample_paths

    model, xi, zi, p0 = problem
    model.covparam = p0
    rng = np.random.default_rng(11)
    xt = gnp.asarray(rng.uniform(size=(64, D)))

    lam_sh = sharded_kriging_weights(model, xi, xt, mesh, block=BLOCK)
    lam, _ = kriging.kriging_predictor(model, xi, xt, return_type=-1)
    np.testing.assert_allclose(np.asarray(lam_sh), np.asarray(lam),
                               rtol=1e-7, atol=1e-9)

    # unconditional sharded draws on a small grid: correct covariance
    key = jax.random.PRNGKey(0)
    paths = sharded_sample_paths(model, xt, 4000, mesh, block=8, key=key)
    emp = np.cov(np.asarray(paths))
    K_ref = np.asarray(model.covariance(xt, xt, p0))
    assert np.abs(emp - K_ref).max() < 0.15 * np.abs(K_ref).max()

    # end-to-end conditioning identical given the same simulated paths
    n, nt = xi.shape[0], xt.shape[0]
    xtsim_ind = np.arange(n + nt)
    ztsim = gnp.asarray(np.random.default_rng(1).normal(size=(n + nt, 5)))
    zc_sh = sample_paths.conditional_sample_paths(
        model, ztsim, xtsim_ind[:n], zi, xtsim_ind[n:], lam_sh,
        convert_out=True)
    zc = sample_paths.conditional_sample_paths(
        model, ztsim, xtsim_ind[:n], zi, xtsim_ind[n:], lam,
        convert_out=True)
    np.testing.assert_allclose(zc_sh, zc, rtol=1e-6, atol=1e-8)
