# tests/test_scoringrules.py
"""Scoring-rule oracle tests (reference tests/test_scoringrules.py style:
hard numerical oracles).  crps via an independent closed form; tcrps
limit cases."""

import numpy as np

import gpmp_tpu.num as gnp
from gpmp_tpu.misc.scoringrules import crps_gaussian, ei1_up, tcrps_gaussian


def _crps_oracle(mu, sigma, z):
    from scipy.stats import norm

    t = (z - mu) / sigma
    return sigma * (t * (2 * norm.cdf(t) - 1) + 2 * norm.pdf(t) - 1 / np.sqrt(np.pi))


def test_crps_gaussian_oracle():
    mu = np.array([0.0, 1.0, -0.5])
    sigma = np.array([1.0, 0.5, 2.0])
    z = np.array([0.3, 0.9, -2.0])
    got = np.asarray(crps_gaussian(mu, sigma, z))
    np.testing.assert_allclose(got, _crps_oracle(mu, sigma, z), rtol=1e-10)


def test_crps_via_sampling():
    # CRPS(P, z) = E|X - z| - 0.5 E|X - X'|
    rng = np.random.default_rng(0)
    mu, sigma, z = 0.4, 1.3, -0.2
    xs = rng.normal(mu, sigma, size=200000)
    xs2 = rng.normal(mu, sigma, size=200000)
    mc = np.mean(np.abs(xs - z)) - 0.5 * np.mean(np.abs(xs - xs2))
    got = float(np.asarray(crps_gaussian(mu, sigma, z)).reshape(-1)[0])
    np.testing.assert_allclose(got, mc, atol=0.01)


def test_ei1_up_limits():
    # far above z: EI1 ~ mu - z ; far below: ~ 0
    v = float(np.asarray(ei1_up(10.0, 1.0, 0.0)))
    np.testing.assert_allclose(v, 10.0, rtol=1e-6)
    v2 = float(np.asarray(ei1_up(-10.0, 1.0, 0.0)))
    assert v2 < 1e-8


def test_tcrps_reduces_to_crps_for_infinite_bounds():
    mu = np.array([0.2]); sigma = np.array([0.8]); z = np.array([0.5])
    got = np.asarray(tcrps_gaussian(mu, sigma, z))
    exp = np.asarray(crps_gaussian(mu, sigma, z))
    np.testing.assert_allclose(got, exp, rtol=1e-10)


def test_tcrps_one_sided_finite():
    mu = np.array([0.0]); sigma = np.array([1.0]); z = np.array([0.3])
    v = np.asarray(tcrps_gaussian(mu, sigma, z, a=-gnp.inf, b=5.0))
    # wide truncation ~ untruncated
    exp = np.asarray(crps_gaussian(mu, sigma, z))
    np.testing.assert_allclose(v, exp, atol=1e-3)


def test_tcrps_two_sided_runs():
    v = np.asarray(
        tcrps_gaussian(np.array([0.0]), np.array([1.0]), np.array([0.2]),
                       a=-2.0, b=2.0)
    )
    assert np.isfinite(v).all()
