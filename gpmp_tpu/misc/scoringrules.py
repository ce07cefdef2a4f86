# gpmp_tpu/misc/scoringrules.py
"""Scoring rules for probabilistic (Gaussian) predictions.

API parity with /root/reference/gpmp/misc/scoringrules.py:16-152.
"""

import gpmp_tpu.num as gnp


def crps_gaussian(mu, sigma, z):
    """Closed-form CRPS for a Gaussian predictive distribution.

    CRPS(N(mu, sigma^2), z) = sigma * (t (2 Phi(t) - 1) + 2 phi(t) - 1/sqrt(pi))
    with t = (z - mu)/sigma.
    """
    mu = gnp.asarray(mu)
    sigma = gnp.asarray(sigma)
    z = gnp.asarray(z)
    t = (z - mu) / sigma
    term1 = t * (2 * gnp.normal.cdf(t) - 1)
    term2 = 2 * gnp.normal.pdf(t)
    term3 = 1 / gnp.sqrt(gnp.pi)
    return sigma * (term1 + term2 - term3)


def h1(t):
    return t * gnp.normal.cdf(t) + gnp.normal.pdf(t)


def ei1_up(mu, sigma, z):
    """First-order upper expected improvement EI1_up(N(mu, sigma^2), z)."""
    t = (mu - z) / sigma
    return sigma * h1(t)


def ei2_up(mu, sigma, z):
    """Second-order upper expected improvement EI2_up(N(mu, sigma^2), z)."""
    t = (mu - z) / sigma
    if gnp.isscalar(t):
        t = gnp.array([t])
    delta_2_t = gnp.hstack((t.reshape(-1, 1), gnp.zeros((t.shape[0], 1))))
    D_2 = gnp.array([[-1.0, 0.0], [-1.0, 1.0]])
    term1 = 2.0 * t * gnp.multivariate_normal.cdf(
        delta_2_t, mean=gnp.zeros(2), cov=gnp.matmul(D_2, D_2.T)
    )
    term2 = 2.0 * gnp.normal.pdf(t) * gnp.normal.cdf(-t)
    term3 = 1.0 / gnp.sqrt(gnp.pi) * gnp.normal.cdf(t, loc=0.0, scale=gnp.sqrt(0.5))
    return sigma * (term1 + term2 + term3)


def tcrps_gaussian(mu, sigma, z, a=-gnp.inf, b=gnp.inf):
    """Truncated CRPS S_{a,b}^tCRPS(N(mu, sigma^2), z) on the interval [a, b]."""
    mu = gnp.asarray(mu)
    sigma = gnp.asarray(sigma)
    z = gnp.asarray(z)
    a = gnp.asarray(a)
    b = gnp.asarray(b)
    a_finite = bool(gnp.isfinite(a))
    b_finite = bool(gnp.isfinite(b))
    if a_finite and b_finite:
        term1 = gnp.maximum(gnp.minimum(b, z) - a, 0.0)
        term2 = ei2_up(mu, sigma, b) - ei2_up(mu, sigma, a)
        term3 = -2 * gnp.where(
            z <= b, ei1_up(mu, sigma, b) - ei1_up(mu, sigma, gnp.maximum(a, z)), 0
        )
        return term1 + term2 + term3
    elif (not a_finite) and b_finite:
        term1 = gnp.minimum(b, z)
        term2 = ei2_up(mu, sigma, b) - (mu + sigma / gnp.sqrt(gnp.pi))
        term3 = -2 * gnp.where(
            z <= b, ei1_up(mu, sigma, b) - ei1_up(mu, sigma, z), 0
        )
        return term1 + term2 + term3
    elif a_finite and not b_finite:
        return tcrps_gaussian(-mu, sigma, -z, a=-gnp.inf, b=-a)
    else:
        return crps_gaussian(mu, sigma, z)
