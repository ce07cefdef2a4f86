# tests/test_modeldiagnosis.py
"""Diagnostics: report, performance metrics, parameter statistics."""

import io
import sys

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu import modeldiagnosis as md


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, 3, covparam, pairwise)


def _fitted_model():
    xi = gp.misc.designs.ldrandunif(1, 8, [[-1], [1]], seed=0)
    zi = gp.misc.testfunctions.twobumps(xi)
    model = gp.Model(constant_mean, kernel)
    model, info = gp.kernel.select_parameters_with_reml(model, xi, zi, info=True)
    return model, info, xi, zi


def test_diag_prints_report():
    model, info, xi, zi = _fitted_model()
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        md.diag(model, info, xi, zi)
    finally:
        sys.stdout = old
    out = buf.getvalue()
    assert "[Model diagnosis]" in out
    assert "Parameter selection" in out
    assert "sigma2" in out
    assert "delta_over_sigma" in out or "delta" in out


def test_compute_performance_loo_and_test():
    model, info, xi, zi = _fitted_model()
    xt = gp.misc.designs.regulargrid(1, 50, [[-1], [1]])
    zt = gp.misc.testfunctions.twobumps(xt)
    p = md.compute_performance(model, xi, zi, xtzt=(xt, zt), compute_pit=True)
    assert 0 <= float(p["loo_Q2"]) <= 1.0 or float(p["loo_Q2"]) < 0  # finite
    assert np.isfinite(float(p["loo_press"]))
    assert np.isfinite(float(p["test_rmse"]))
    assert p["loo_pit"].shape[0] == 8
    # R2 relation
    np.testing.assert_allclose(
        float(p["test_R2"]), 1 - float(p["test_rss"]) / float(p["test_tss"]),
        rtol=1e-12,
    )


def test_perf_prints():
    model, info, xi, zi = _fitted_model()
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        md.perf(model, xi, zi)
    finally:
        sys.stdout = old
    assert "press" in buf.getvalue()


def test_selection_criterion_statistics_fast():
    model, info, xi, zi = _fitted_model()
    info.model = model
    info.xi = gnp.asarray(xi)
    out = md.selection_criterion_statistics_fast(info=info, delta=2.0,
                                                 n_points=40)
    df = out["parameter_statistics"]
    assert df.data.shape == (2, 8)
    assert np.isfinite(df.data).all()
    F = np.asarray(out["fisher_information"])
    assert F.shape == (2, 2)


def test_selection_criterion_statistics_quad():
    model, info, xi, zi = _fitted_model()
    info.model = model
    info.xi = gnp.asarray(xi)
    out = md.selection_criterion_statistics(info=info, delta=1.5)
    df = out["parameter_statistics"]
    assert np.isfinite(df.data).all()


def test_unnormalized_1d_distribution_gaussian():
    dist = md.Unnormalized1DDistribution(
        lambda x: -0.5 * (x - 1.0) ** 2 / 0.25, bounds=(-5.0, 7.0)
    )
    np.testing.assert_allclose(dist.mean(), 1.0, atol=1e-6)
    np.testing.assert_allclose(dist.var(), 0.25, atol=1e-6)
    np.testing.assert_allclose(dist.quantile(0.5), 1.0, atol=1e-4)
    np.testing.assert_allclose(dist.cdf(1.0), 0.5, atol=1e-6)


def test_sigma_rho_from_covparam():
    out = md.sigma_rho_from_covparam(np.array([np.log(4.0), -np.log(2.0)]))
    np.testing.assert_allclose(out["sigma"], 2.0, rtol=1e-12)
    np.testing.assert_allclose(out["rho0"], 2.0, rtol=1e-12)
