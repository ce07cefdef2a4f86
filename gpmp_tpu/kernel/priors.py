# gpmp_tpu/kernel/priors.py
"""Priors for GP covariance-parameter MAP estimation (REMAP).

Reference semantics: /root/reference/gpmp/kernel/priors.py:43-558.
All priors are jit/grad-safe functions of covparam; hyperparameters are
Python floats resolved on the host before tracing.
"""

from statistics import NormalDist

import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .prior_defaults import get_default_prior_hyperparameters


def log_prior_jeffreys_variance(covparam, lambda_var=1.0):
    """Jeffreys-style variance prior: log p = -lambda_var * log(sigma2)."""
    return -lambda_var * covparam[0]


def log_prior_power_law(
    covparam,
    lambda_var=1.0,
    cut_logvariance_high=9.21,
    lambda_lengthscales=0.0,
    cut_loginvrho_low=-9.21,
    cut_loginvrho_high=9.21,
    penalty_factor=100,
):
    """Power-law prior with soft linear cutoffs on covariance parameters."""
    log_sigma2 = covparam[0]
    p = covparam[1:]
    log_prior_sigma2 = -lambda_var * log_sigma2
    extra_sigma2 = penalty_factor * gnp.maximum(log_sigma2 - cut_logvariance_high, 0)
    extra_low = penalty_factor * gnp.maximum(cut_loginvrho_low - p, 0)
    extra_high = penalty_factor * gnp.maximum(p - cut_loginvrho_high, 0)
    log_prior_lengths = (
        -lambda_lengthscales * gnp.sum(p) - gnp.sum(extra_low) - gnp.sum(extra_high)
    )
    return log_prior_sigma2 + extra_sigma2 + log_prior_lengths


def log_prior_reference(model, covparam, xi):
    """Jeffreys-rule prior 0.5 log det(FisherInfo(theta))."""
    fisher_info = model.fisher_information(xi, covparam)
    return 0.5 * gnp.logdet(fisher_info)


def _resolve_prior_defaults(gamma=None, sigma2_coverage=None, alpha=None, xi=None):
    defaults = get_default_prior_hyperparameters(xi)
    if gamma is None:
        gamma = defaults["gamma"]
    if sigma2_coverage is None:
        sigma2_coverage = defaults["sigma2_coverage"]
    if alpha is None:
        alpha = defaults["alpha"]
    return gamma, sigma2_coverage, alpha


def _logsigma2_prior_std(gamma, sigma2_coverage):
    """Std of the log-variance Gaussian prior, calibrated so that
    P(sigma2 in [sigma2_0/gamma, sigma2_0*gamma]) = sigma2_coverage."""
    if gamma <= 1.0:
        raise ValueError("gamma must be > 1.")
    if not (0.0 < sigma2_coverage < 1.0):
        raise ValueError("sigma2_coverage must be in (0, 1).")
    q = 0.5 * (1.0 + sigma2_coverage)
    zq = NormalDist().inv_cdf(q)
    if zq <= 0.0:
        raise ValueError("Invalid sigma2_coverage: non-positive Gaussian quantile.")
    import math

    return math.log(gamma) / zq


def log_prior_gaussian_logsigma2(covparam, log_sigma2_0, gamma=None,
                                 sigma2_coverage=None):
    """Gaussian prior on log(sigma2), centered at log_sigma2_0."""
    gamma, sigma2_coverage, _ = _resolve_prior_defaults(
        gamma=gamma, sigma2_coverage=sigma2_coverage
    )
    log_sigma2 = covparam[0]
    std = _logsigma2_prior_std(gamma, sigma2_coverage)
    z = (log_sigma2 - log_sigma2_0) / std
    return -0.5 * z * z


def neglog_f_logrho(logrho, logrho_min, logrho_0, alpha=None):
    """Barrier + linear-tail penalty on logrho; +inf below logrho_min.

    nlf = -alpha_eff * log(logrho - logrho_min) + beta * (logrho - logrho_min)
    with beta = alpha and alpha_eff = beta * (logrho_0 - logrho_min) so the
    minimum sits at logrho_0.
    """
    import numpy as onp
    import jax as _jax

    _, _, alpha = _resolve_prior_defaults(alpha=alpha)
    if alpha <= 0:
        raise ValueError("alpha must be > 0.")
    logrho_min = gnp.asarray(logrho_min)
    logrho_0 = gnp.asarray(logrho_0)
    # host-side validation with numpy (a jnp comparison would be staged
    # into the trace when this runs inside a jitted criterion)
    if not isinstance(logrho_min, _jax.core.Tracer) and not isinstance(
        logrho_0, _jax.core.Tracer
    ):
        if bool(onp.any(onp.asarray(logrho_0) <= onp.asarray(logrho_min))):
            raise ValueError("logrho_0 must be > logrho_min (componentwise).")

    beta = alpha
    alpha_eff = beta * (logrho_0 - logrho_min)
    logrho_shifted = logrho - logrho_min
    mask = logrho_shifted > 0.0
    shifted_safe = jnp.where(mask, logrho_shifted, 1.0)
    nlf_valid = -alpha_eff * jnp.log(shifted_safe) + beta * shifted_safe
    return jnp.where(mask, nlf_valid, jnp.inf)


def log_prior_logrho_barrier_linear(covparam, logrho_min, logrho_0, alpha=None):
    """Prior on lengthscales through logrho = -covparam[1:]."""
    _, _, alpha = _resolve_prior_defaults(alpha=alpha)
    logrho = -covparam[1:]
    nlf = neglog_f_logrho(logrho, logrho_min, logrho_0, alpha=alpha)
    return -gnp.sum(nlf)


# ------------------- posterior objective wrappers -------------------
def neg_log_restricted_posterior_with_jeffreys_prior(model, covparam, xi, zi,
                                                     lambda_var=1.0):
    nlrl = model.negative_log_restricted_likelihood(covparam, xi, zi)
    return nlrl - log_prior_jeffreys_variance(covparam, lambda_var)


def neg_log_restricted_posterior_power_laws_prior(model, covparam, xi, zi):
    nlrl = model.negative_log_restricted_likelihood(covparam, xi, zi)
    return nlrl - log_prior_power_law(covparam)


def neg_log_restricted_posterior_logsigma2_prior(
    model, covparam, xi, zi, log_sigma2_0, gamma=None, sigma2_coverage=None
):
    nlrl = model.negative_log_restricted_likelihood(covparam, xi, zi)
    return nlrl - log_prior_gaussian_logsigma2(
        covparam, log_sigma2_0, gamma=gamma, sigma2_coverage=sigma2_coverage
    )


def neg_log_restricted_posterior_with_logrho_prior(
    model, covparam, xi, zi, logrho_min, logrho_0, alpha=None
):
    nlrl = model.negative_log_restricted_likelihood(covparam, xi, zi)
    return nlrl - log_prior_logrho_barrier_linear(
        covparam, logrho_min=logrho_min, logrho_0=logrho_0, alpha=alpha
    )


def neg_log_restricted_posterior_logsigma2_and_logrho_prior(
    model,
    covparam,
    xi,
    zi,
    log_sigma2_0,
    gamma=None,
    sigma2_coverage=None,
    logrho_min=None,
    logrho_0=None,
    alpha=None,
):
    """REML + Gaussian log-sigma2 prior + barrier/linear logrho prior
    (the default REMAP objective, reference priors.py:467-558)."""
    if logrho_min is None or logrho_0 is None:
        raise ValueError("logrho_min and logrho_0 must be provided.")
    gamma, sigma2_coverage, alpha = _resolve_prior_defaults(
        gamma=gamma, sigma2_coverage=sigma2_coverage, alpha=alpha, xi=xi
    )
    nlrl = model.negative_log_restricted_likelihood(covparam, xi, zi)
    return (
        nlrl
        - log_prior_gaussian_logsigma2(
            covparam, log_sigma2_0, gamma=gamma, sigma2_coverage=sigma2_coverage
        )
        - log_prior_logrho_barrier_linear(
            covparam, logrho_min=logrho_min, logrho_0=logrho_0, alpha=alpha
        )
    )
