# gpmp_tpu/kernel/matern.py
"""Matern covariance family (half-integer regularity nu = p + 1/2).

TPU-native reimplementation of the reference kernels
(/root/reference/gpmp/kernel/matern.py:10-141).  Design deltas:

- ``p`` is a static Python int, so the polynomial coefficients are computed
  once on the host with exact ``math.lgamma`` (the reference maintains a
  gammaln device table, matern.py:54); the device evaluates one Horner
  recurrence -- fully fused by XLA into the gram construction.
- The inf guard is the analytic limit K(inf) = 0 instead of the reference's
  big-float substitution (which produces 0*inf under IEEE semantics).
- Everything is jit/grad/vmap-safe; covparam may be a tracer.
"""

from math import exp, lgamma, sqrt

import jax.numpy as jnp

import gpmp_tpu.num as gnp


def matern32_kernel(h):
    """Matern 3/2 kernel: K(h) = (1 + 2*sqrt(3/2)*h) * exp(-2*sqrt(3/2)*h)."""
    nu = 3.0 / 2.0
    c = 2.0 * sqrt(nu)
    t = c * h
    return (1.0 + t) * gnp.exp(-t)


def _maternp_poly_coeffs(p: int):
    """Coefficients a_k of the half-integer Matern polynomial.

    K(h) = exp(-2 sqrt(nu) h) * sum_{k=0}^{p} a_k (4 sqrt(nu) h)^k with
    a_k = Gamma(p+1)/Gamma(2p+1) * (2p-k)! / ((p-k)! k!); a_0 = 1.
    """
    return [
        exp(
            lgamma(p + 1)
            - lgamma(2 * p + 1)
            + lgamma(2 * p - k + 1)
            - lgamma(p - k + 1)
            - lgamma(k + 1)
        )
        for k in range(p + 1)
    ]


def maternp_kernel(p: int, h):
    """Matern kernel with half-integer regularity nu = p + 1/2.

    Polynomial form (Abramowitz & Stegun), evaluated by Horner's rule on
    the VPU; matches reference matern.py:32-64 semantics.
    """
    p = int(p)
    c = 2.0 * sqrt(p + 0.5)
    if p == 0:
        return gnp.exp(-c * h)
    coeffs = _maternp_poly_coeffs(p)
    twoch = 2.0 * c * h
    poly = jnp.full_like(twoch, coeffs[p])
    for k in range(p - 1, -1, -1):
        poly = poly * twoch + coeffs[k]
    out = gnp.exp(-c * h) * poly
    # analytic limit at h = +inf (reference guards with a big-float swap)
    return jnp.where(jnp.isinf(h), jnp.zeros_like(out), out)


def maternp_covariance_ii_or_tt(x, p, param, pairwise=False):
    """Covariance among observations (or among predictands) at x.

    covparam layout: param = [log(sigma2), log(1/rho_1), ..., log(1/rho_d)].
    Adds the fixed relative nugget 10 * sigma2 * eps on the diagonal
    (reference matern.py:90).
    """
    sigma2 = gnp.exp(param[0])
    loginvrho = param[1:]
    nugget = 10.0 * sigma2 * gnp.eps
    if pairwise:
        return sigma2 * gnp.ones((x.shape[0],))
    K = gnp.scaled_distance(loginvrho, x, x)
    return sigma2 * maternp_kernel(p, K) + nugget * gnp.eye(K.shape[0])


def maternp_covariance_it(x, y, p, param, pairwise=False):
    """Cross-covariance between observations x and prediction points y."""
    sigma2 = gnp.exp(param[0])
    loginvrho = param[1:]
    if pairwise:
        D = gnp.scaled_distance_elementwise(loginvrho, x, y)
    else:
        D = gnp.scaled_distance(loginvrho, x, y)
    return sigma2 * maternp_kernel(p, D)


def maternp_covariance(x, y, p, param, pairwise=False):
    """Matern covariance wrapper; y is x / y is None selects the ii/tt path
    with nugget (reference matern.py:124-141 dispatch)."""
    if y is x or y is None:
        return maternp_covariance_ii_or_tt(x, p, param, pairwise)
    return maternp_covariance_it(x, y, p, param, pairwise)
