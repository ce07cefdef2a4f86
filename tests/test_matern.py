# tests/test_matern.py
"""Matern kernel golden-value tests against independent NumPy/SciPy oracles."""

import numpy as np
import scipy.spatial.distance
import scipy.special

import gpmp_tpu.num as gnp
from gpmp_tpu.kernel import (
    matern32_kernel,
    maternp_covariance,
    maternp_kernel,
)


def _maternp_kernel_oracle(p, h):
    """Reference formula: K(h) = exp(-2 sqrt(nu) h) * Gamma(p+1)/Gamma(2p+1)
    * sum_{i=0}^{p} (p+i)!/(i!(p-i)!) (4 sqrt(nu) h)^(p-i), nu = p+1/2."""
    h = np.asarray(h, dtype=float)
    c = 2.0 * np.sqrt(p + 0.5)
    twoch = 2.0 * c * h
    gln = scipy.special.gammaln(np.arange(2 * p + 2))
    poly = np.ones_like(h)
    for i in range(p):
        coef = np.exp(
            gln[p + 1] - gln[2 * p + 1] + gln[p + i + 1] - gln[i + 1] - gln[p - i + 1]
        )
        poly += coef * twoch ** (p - i)
    return np.exp(-c * h) * poly


def test_matern32_matches_oracle():
    h = np.linspace(0, 5, 50)
    k = matern32_kernel(gnp.asarray(h))
    c = 2 * np.sqrt(1.5)
    k_ref = (1 + c * h) * np.exp(-c * h)
    np.testing.assert_allclose(np.asarray(k), k_ref, rtol=1e-12)


def test_maternp_kernel_matches_oracle():
    h = np.linspace(0, 4, 33)
    for p in [0, 1, 2, 3, 5, 8]:
        k = maternp_kernel(p, gnp.asarray(h))
        k_ref = _maternp_kernel_oracle(p, h)
        np.testing.assert_allclose(np.asarray(k), k_ref, rtol=1e-10, atol=1e-14)


def test_maternp_kernel_limits():
    # K(0) = 1, K(inf) = 0 (no NaN)
    for p in [0, 2, 3]:
        k = maternp_kernel(p, gnp.asarray(np.array([0.0, np.inf])))
        np.testing.assert_allclose(np.asarray(k), [1.0, 0.0], atol=1e-14)


def test_maternp_covariance_full_matrix():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, 2))
    param = np.array([np.log(1.7), 0.3, -0.2])
    p = 3
    K = maternp_covariance(gnp.asarray(x), None, p, gnp.asarray(param))
    # oracle
    sigma2 = np.exp(param[0])
    invrho = np.exp(param[1:])
    D = scipy.spatial.distance.cdist(invrho * x, invrho * x)
    K_ref = sigma2 * _maternp_kernel_oracle(p, D)
    K_ref += 10.0 * sigma2 * np.finfo(np.float64).eps * np.eye(12)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-10, atol=1e-14)


def test_maternp_covariance_pairwise_and_cross():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(7, 3))
    y = rng.normal(size=(5, 3))
    param = np.array([np.log(2.0), 0.1, 0.0, -0.4])
    p = 2
    xj = gnp.asarray(x)
    # pairwise ii: variance vector
    v = maternp_covariance(xj, xj, p, gnp.asarray(param), pairwise=True)
    np.testing.assert_allclose(np.asarray(v), 2.0 * np.ones(7), rtol=1e-12)
    # cross
    Kxy = maternp_covariance(xj, gnp.asarray(y), p, gnp.asarray(param))
    sigma2 = np.exp(param[0])
    invrho = np.exp(param[1:])
    D = scipy.spatial.distance.cdist(invrho * x, invrho * y)
    np.testing.assert_allclose(
        np.asarray(Kxy), sigma2 * _maternp_kernel_oracle(p, D), rtol=1e-10
    )


def test_maternp_covariance_grad_is_finite():
    import jax

    rng = np.random.default_rng(2)
    x = gnp.asarray(rng.normal(size=(9, 2)))
    param = gnp.asarray(np.array([0.2, 0.1, -0.1]))

    def f(prm):
        K = maternp_covariance(x, None, 3, prm)
        return gnp.sum(K)

    g = jax.grad(f)(param)
    assert np.all(np.isfinite(np.asarray(g)))
