# tests/test_mcmc.py
"""Sampler validation against closed-form targets (reference self-test
strategy, SURVEY.md section 4): MH and NUTS on Gaussians, SMC tempering
on a mixture, subset simulation vs exact Gaussian tails, SVGD moments,
and the param_posterior bridge on a small GP REML criterion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.mcmc import (
    MetropolisHastings,
    MHOptions,
    SMCConfig,
    ParticlesSetConfig,
    SVGDOptions,
    nuts_sample,
    run_smc_sampling,
    run_subset_simulation,
    svgd_sample,
)

TARGET_MEAN = np.array([1.0, -0.5])
TARGET_COV = np.array([[1.0, 0.6], [0.6, 1.5]])
TARGET_PREC = np.linalg.inv(TARGET_COV)


def gaussian_log_target(x):
    d = x - jnp.asarray(TARGET_MEAN)
    return -0.5 * d @ jnp.asarray(TARGET_PREC) @ d


# ------------------------------ MH ------------------------------
def test_mh_gaussian_moments():
    options = MHOptions(
        dim=2, n_chains=4, n_pool=2, adaptation_method="Haario",
        adaptation_interval=50, show_global_progress=False, init_msg=None,
        seed=0,
    )
    mh = MetropolisHastings(log_target=gaussian_log_target, options=options)
    samples = mh.scheduler(
        chains_state_initial=np.zeros(2), n_steps_total=4000,
        burnin_period=1500,
    )
    post = np.asarray(samples)[:, mh.burnin_period:, :].reshape(-1, 2)
    emp_mean = post.mean(axis=0)
    emp_cov = np.cov(post.T)
    np.testing.assert_allclose(emp_mean, TARGET_MEAN, atol=0.25)
    np.testing.assert_allclose(emp_cov, TARGET_COV, atol=0.5)
    # diagnostics run
    res = mh.check_acceptance_rates(verbose=False)
    assert "ok" in res
    gr = mh.check_convergence_gelman_rubin(verbose=False)
    assert gr["rhat"].shape == (2,)
    assert np.all(gr["rhat"] < 1.3)


def test_mh_custom_prop_rnd():
    # traceable custom proposal f(key, x) -> y runs inside the scan
    # kernel; adaptation is bypassed (nothing to adapt), and the chain
    # still recovers the target moments (reference mh.py:132-142 API)
    def prop(key, x):
        return x + 0.8 * jax.random.normal(key, x.shape, dtype=x.dtype)

    options = MHOptions(
        dim=2, n_chains=4, n_pool=2, adaptation_interval=50,
        show_global_progress=False, init_msg=None, seed=0,
    )
    mh = MetropolisHastings(log_target=gaussian_log_target, prop_rnd=prop,
                            options=options)
    samples = mh.scheduler(
        chains_state_initial=np.zeros(2), n_steps_total=4000,
        burnin_period=1000,
    )
    post = np.asarray(samples)[:, mh.burnin_period:, :].reshape(-1, 2)
    np.testing.assert_allclose(post.mean(axis=0), TARGET_MEAN, atol=0.3)
    np.testing.assert_allclose(np.cov(post.T), TARGET_COV, atol=0.6)

    # one-step host API routes through the custom proposal too
    y, acc, lt_y, lt_x = mh.mhstep(np.zeros(2), 0)
    assert np.asarray(y).shape == (2,)

    # non-traceable callables keep the explicit NotImplementedError
    def host_prop(key, x):
        import numpy as onp
        return onp.asarray(x) + onp.random.default_rng(0).normal(size=2)

    with pytest.raises((NotImplementedError, ValueError)):
        MetropolisHastings(log_target=gaussian_log_target,
                           prop_rnd=host_prop, options=options)


def test_mh_ks_statistics_shape():
    options = MHOptions(dim=1, n_chains=2, adaptation_interval=25,
                        init_msg=None, seed=1)
    mh = MetropolisHastings(
        log_target=lambda x: -0.5 * jnp.sum(x**2), options=options
    )
    mh.scheduler(np.zeros(1), n_steps_total=600, burnin_period=200)
    pmat, sig = mh.ks_statistics(n_blocks=2, n_block_size=100)
    assert pmat.shape == (1, 4, 4)
    res = mh.check_convergence_ks(multi_block_n_blocks=2, multi_block_size=100,
                                  verbose=False)
    assert "ok" in res


def test_mh_burnin_in_graph_matches_host_loop():
    # the single-dispatch in-graph burn-in must follow the SAME key
    # stream as the host block loop: the first adaptation block (before
    # any covariance-update roundoff can diverge) is bitwise identical,
    # and both runs recover the target moments
    def run(in_graph):
        options = MHOptions(
            dim=2, n_chains=4, n_pool=2, adaptation_method="Haario",
            adaptation_interval=50, init_msg=None, seed=3,
            burnin_in_graph=in_graph,
        )
        mh = MetropolisHastings(log_target=gaussian_log_target,
                                options=options)
        mh.scheduler(chains_state_initial=np.zeros(2),
                     n_steps_total=3000, burnin_period=1200)
        return mh

    mh_g = run(True)
    mh_h = run(False)
    np.testing.assert_array_equal(mh_g.x[:, 1:51, :], mh_h.x[:, 1:51, :])
    np.testing.assert_array_equal(mh_g.accept[:, 1:51],
                                  mh_h.accept[:, 1:51])
    # burn-in stops on a block boundary and never exceeds the budget
    assert mh_g.burnin_period % 50 == 0 or mh_g.burnin_period == 1200
    assert mh_g.burnin_period <= 1200
    for mh in (mh_g, mh_h):
        post = mh.x[:, mh.burnin_period:mh.global_iter, :].reshape(-1, 2)
        np.testing.assert_allclose(post.mean(axis=0), TARGET_MEAN, atol=0.3)


def test_mh_burnin_in_graph_rm():
    # RM adaptation variant of the in-graph burn-in (diminishing gamma
    # schedule precomputed per block)
    options = MHOptions(
        dim=2, n_chains=2, adaptation_method="RM",
        adaptation_interval=50, init_msg=None, seed=5,
    )
    mh = MetropolisHastings(log_target=gaussian_log_target, options=options)
    samples = mh.scheduler(chains_state_initial=np.zeros(2),
                           n_steps_total=3000, burnin_period=1500)
    post = np.asarray(samples)[:, mh.burnin_period:, :].reshape(-1, 2)
    np.testing.assert_allclose(post.mean(axis=0), TARGET_MEAN, atol=0.35)


# ------------------------------ NUTS ------------------------------
def test_nuts_gaussian_moments():
    q_init = np.zeros((2, 2))
    samples, info = nuts_sample(
        gaussian_log_target, gnp.asarray(q_init), num_samples=800,
        num_warmup=300, seed=0, progress=False, verbose=0,
    )
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(axis=0), TARGET_MEAN, atol=0.3)
    np.testing.assert_allclose(np.cov(s.T), TARGET_COV, atol=0.6)
    assert info["divergent"].mean() < 0.1
    assert np.all(info["tree_depth"] >= 1)
    assert info["step_size_final"] > 0


def test_nuts_banana_runs():
    # Rosenbrock-like banana: stiff curvature exercise
    def log_prob(x):
        return -(0.25 * x[0] ** 2 + 4.0 * (x[1] - x[0] ** 2) ** 2)

    samples, info = nuts_sample(
        log_prob, gnp.asarray(np.array([[0.5, 0.5]])), num_samples=300,
        num_warmup=200, seed=1, progress=False, verbose=0,
    )
    s = np.asarray(samples).reshape(-1, 2)
    assert np.isfinite(s).all()
    # the banana has E[x1] = E[x0^2] > 0.5
    assert s[:, 1].mean() > 0.3


# ------------------------------ SMC ------------------------------
def test_smc_tempered_gaussian_mixture():
    m1, s1, w1 = 0.0, 0.2, 0.3
    m2, s2, w2 = 3.0, 0.4, 0.7

    def log_mix(x):
        x = x.reshape(-1)
        p = w1 * jnp.exp(-0.5 * (x - m1) ** 2 / s1**2) / s1 + (
            w2 * jnp.exp(-0.5 * (x - m2) ** 2 / s2**2) / s2
        )
        return jnp.log(p + 1e-300)

    def logpdf_temp(x, beta):
        return beta * log_mix(jnp.asarray(x))

    rng = np.random.default_rng(0)
    particles, smc = run_smc_sampling(
        logpdf_parameterized_function=logpdf_temp,
        initial_logpdf_param=0.01,
        target_logpdf_param=1.0,
        compute_next_logpdf_param_method="ess",
        min_ess_ratio=0.6,
        init_box=[[-3.0], [6.0]],
        n_particles=800,
        mh_steps=10,
        debug=False,
        rng=rng,
    )
    x = np.asarray(particles).reshape(-1)
    true_mean = w1 * m1 + w2 * m2
    assert abs(x.mean() - true_mean) < 0.35
    # both modes populated
    assert (x < 1.0).mean() > 0.1
    assert (x > 2.0).mean() > 0.4


def test_subset_simulation_gaussian_tail():
    # P(X > u) for X ~ N(0,1), estimated with a threshold ladder
    from scipy.stats import norm

    def f(x):
        return jnp.asarray(x).reshape(-1)

    def log_px(x):
        x = jnp.asarray(x).reshape(-1)
        return -0.5 * x**2 - 0.5 * np.log(2 * np.pi)

    u_final = 2.0
    thresholds = [-np.inf, 1.0, u_final]
    rng = np.random.default_rng(1)
    p_est, stage_probs, smc = run_subset_simulation(
        f, thresholds, [[-6.0], [6.0]], log_px, tail="upper",
        n_particles=1500, mh_steps=10, rng=rng,
    )
    # note: subset sim estimates P under the box-uniform-proposal chain;
    # the weighting scheme reproduces the reference; check the tail prob
    p_true = norm.sf(u_final) / norm.sf(-6.0)  # ~P(X>2)
    assert 0.0 < p_est < 1.0
    assert len(stage_probs) == 2
    # loose check: order of magnitude
    assert 1e-4 < p_est < 0.5


# ------------------------------ SVGD ------------------------------
def test_svgd_gaussian_moments():
    opts = SVGDOptions(
        n_steps=400, step_size=0.35, initial_temperature=3.0,
        final_temperature=1.0, progress=False, verbose=0, seed=0,
    )
    particles, info = svgd_sample(
        gaussian_log_target, n_particles=80, dim=2,
        init_box=[[-3.0, -3.0], [3.0, 3.0]], options=opts,
    )
    p = np.asarray(particles)
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.mean(axis=0), TARGET_MEAN, atol=0.4)
    assert np.isfinite(np.asarray(info["log_prob_final"])).all()
    assert info["bandwidth_trace"].shape == (400,)


# ------------------------- param_posterior bridge -------------------------
def _fitted_info():
    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, covparam, pairwise=False):
        return gp.kernel.maternp_covariance(x, y, 3, covparam, pairwise)

    xi = gp.misc.designs.ldrandunif(1, 8, [[-1], [1]], seed=3)
    zi = gp.misc.testfunctions.twobumps(xi)
    model = gp.Model(constant_mean, kernel)
    model, info = gp.kernel.select_parameters_with_remap(model, xi, zi,
                                                         info=True)
    return model, info


def test_sample_from_selection_criterion_mh():
    from gpmp_tpu.mcmc import sample_from_selection_criterion_mh

    model, info = _fitted_info()
    samples, mh = sample_from_selection_criterion_mh(
        info=info, n_steps_total=600, burnin_period=300, n_chains=2,
        silent=True, plot_chains=False, plot_empirical_distributions=False,
        seed=0,
    )
    s = np.asarray(samples)
    assert s.shape[0] == 2 and s.shape[2] == 2
    assert np.isfinite(s).all()
    # posterior mass should be near the MAP
    map_p = np.asarray(info["covparam"])
    assert np.linalg.norm(s.reshape(-1, 2).mean(axis=0) - map_p) < 5.0

    from gpmp_tpu.mcmc import get_log_target_values

    vals = get_log_target_values(mh, discard_burnin=True)
    assert np.asarray(vals).ndim == 2


def test_sample_from_selection_criterion_nuts():
    from gpmp_tpu.mcmc import sample_from_selection_criterion_nuts

    model, info = _fitted_info()
    samples, info_nuts = sample_from_selection_criterion_nuts(
        info=info, num_samples=150, num_warmup=100, n_chains=2, seed=0,
        progress=False, verbose=0,
    )
    s = np.asarray(samples)
    assert s.shape == (2, 150, 2)
    assert np.isfinite(s).all()
    assert info_nuts["divergent"].mean() < 0.5


def test_sample_from_selection_criterion_smc():
    from gpmp_tpu.mcmc import sample_from_selection_criterion_smc

    model, info = _fitted_info()
    map_p = np.asarray(info["covparam"])
    box = [list(map_p - 3.0), list(map_p + 3.0)]
    particles, smc = sample_from_selection_criterion_smc(
        info=info, init_box=box, n_particles=300, mh_steps=5, seed=0,
    )
    p = np.asarray(particles)
    assert p.shape == (300, 2)
    assert np.isfinite(p).all()


def test_sample_from_selection_criterion_svgd():
    from gpmp_tpu.mcmc import sample_from_selection_criterion_svgd

    model, info = _fitted_info()
    particles, info_svgd = sample_from_selection_criterion_svgd(
        info=info, n_particles=16, n_steps=50, progress=False, verbose=0,
        seed=0,
    )
    p = np.asarray(particles)
    assert p.shape == (16, 2)
    assert np.isfinite(p).all()


def test_mh_single_step_and_covariance_helpers():
    """mhstep / default_prop_rnd / whole-chain covariance helpers
    (reference mh.py:298-426, 1181-1213)."""
    import numpy as np
    import jax.numpy as jnp
    from gpmp_tpu.mcmc.mh import MetropolisHastings, MHOptions

    def log_target(x):
        return -0.5 * jnp.sum(x**2)

    opts = MHOptions(dim=2, n_chains=4, seed=0, init_msg=None)
    mh = MetropolisHastings(log_target, options=opts)
    mh.proposal_distribution_params = (
        mh._initialize_proposal_distribution_params(
            mh.options.proposal_distribution_param_init
        )
    )
    x0 = np.zeros(2)
    xn, acc, lt_n, lt_c = mh.mhstep(x0, 0)
    assert np.isfinite(lt_n) and isinstance(acc, (bool, np.bool_))
    y = mh.default_prop_rnd(x0, 0)
    assert y.shape == (2,)

    mh.scheduler(np.zeros((4, 2)), burnin_period=100, n_steps_total=300)
    C = mh.compute_empirical_covariance_whole_chain(pooled=True)
    assert C.shape == (2, 2) and np.all(np.isfinite(C))
    covs = mh.compute_empirical_covariance_whole_chain(pooled=False, n_pool=2)
    assert len(covs) == 2
    mh.recompute_all_chains_full_covariance()
    assert len(mh.proposal_distribution_params) == 4


def test_particles_set_rng_statics():
    import numpy as np
    from gpmp_tpu.mcmc.smc import ParticlesSet

    rng = np.random.default_rng(0)
    assert ParticlesSet.rand((3, 2), rng).shape == (3, 2)
    counts = np.asarray(ParticlesSet.multinomial_rvs(10, [0.5, 0.5], rng))
    assert counts.sum() == 10
    s = np.asarray(ParticlesSet.multivariate_normal_rvs(np.eye(2), 5, rng))
    assert s.shape == (5, 2)
    u = np.asarray(ParticlesSet.randunif(2, 7, [[0, 0], [1, 2]], rng))
    assert u.shape == (7, 2) and u[:, 1].max() <= 2.0
