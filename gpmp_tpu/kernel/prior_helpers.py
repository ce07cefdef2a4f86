# gpmp_tpu/kernel/prior_helpers.py
"""Helpers for prior-informed parameter selection.

Reference semantics: /root/reference/gpmp/kernel/prior_helpers.py:22-292.
"""

import warnings

import numpy as np

import gpmp_tpu.num as gnp
from .init import anisotropic_parameters_initial_guess
from .prior_defaults import (
    get_default_prior_hyperparameters,
    resolve_prior_defaults_for_selection,
)


def _minimum_nonzero_gap_distance_1d(xj):
    """Smallest positive spacing among points in 1-D (inf if none)."""
    xj = np.asarray(gnp.to_np(gnp.asarray(xj))).reshape(-1)
    if xj.shape[0] < 2:
        return np.inf
    diffs = np.diff(np.sort(xj))
    diffs = diffs[diffs > 0.0]
    return float(np.min(diffs)) if diffs.shape[0] > 0 else np.inf


def _componentwise_logrho_min_from_xi(xi):
    """(log(min nonzero gap) per dim (-inf if none), per-dim range)."""
    xi = np.asarray(gnp.to_np(gnp.asarray(xi)))
    _n, d = xi.shape
    vals, ranges = [], []
    for j in range(d):
        xj = xi[:, j]
        min_gap = _minimum_nonzero_gap_distance_1d(xj)
        vals.append(np.log(min_gap) if np.isfinite(min_gap) else -np.inf)
        ranges.append(float(np.max(xj) - np.min(xj)))
    return np.asarray(vals), np.asarray(ranges)


def compute_logrho_min_from_xi(xi, prior_rho_min_range_factor=None):
    """Safeguarded componentwise prior_logrho_min: max of
    log(min nonzero gap) and log(range * factor)."""
    if prior_rho_min_range_factor is None:
        prior_rho_min_range_factor = get_default_prior_hyperparameters(xi)[
            "rho_min_range_factor"
        ]
    if prior_rho_min_range_factor <= 0:
        raise ValueError("prior_rho_min_range_factor must be strictly positive.")
    logrho_min_gap, x_range = _componentwise_logrho_min_from_xi(xi)
    min_rho_from_range = x_range * float(prior_rho_min_range_factor)
    positive = min_rho_from_range > 0.0
    logrho_min_range = np.where(
        positive, np.log(np.where(positive, min_rho_from_range, 1.0)), -np.inf
    )
    return gnp.asarray(np.maximum(logrho_min_gap, logrho_min_range))


def resolve_covparam0_prior_and_init(
    model, xi=None, zi=None, dataloader=None, *,
    covparam0=None, covparam0_prior=None, covparam0_init=None,
):
    """Resolve the prior anchor and optimizer start for covparam."""
    covparam_initial_guess = None
    if covparam0_init is None:
        if covparam0 is not None:
            covparam0_init = covparam0
        else:
            covparam_initial_guess = anisotropic_parameters_initial_guess(
                model, xi, zi, dataloader
            )
            covparam0_init = covparam_initial_guess

    if covparam0_prior is None:
        if covparam0 is not None:
            covparam0_prior = covparam0
        elif covparam_initial_guess is not None:
            covparam0_prior = covparam_initial_guess
        else:
            covparam0_prior = anisotropic_parameters_initial_guess(
                model, xi, zi, dataloader
            )

    return covparam0_prior, covparam0_init


def resolve_covparam0_roles_for_update(
    model, xi=None, zi=None, dataloader=None, *,
    covparam0=None, covparam0_prior=None, covparam0_init=None,
    warn_covparam0_prior=True,
):
    """Resolution policy for update procedures (warns on implicit prior
    anchoring, reference prior_helpers.py:152-217)."""
    covparam_initial_guess = None
    if covparam0_init is None:
        if covparam0 is not None:
            covparam0_init = covparam0
        elif model.covparam is not None:
            covparam0_init = model.covparam
        else:
            covparam_initial_guess = anisotropic_parameters_initial_guess(
                model, xi, zi, dataloader
            )
            covparam0_init = covparam_initial_guess

    if covparam0_prior is None:
        if covparam0 is not None:
            if warn_covparam0_prior:
                warnings.warn(
                    "covparam0 provided without covparam0_prior in update "
                    "procedure; using covparam0 as covparam0_prior. "
                    "Pass covparam0_prior explicitly to avoid this coupling.",
                    stacklevel=2,
                )
            covparam0_prior = covparam0
        elif model.covparam is not None:
            if warn_covparam0_prior:
                warnings.warn(
                    "covparam0 and covparam0_prior not provided in update "
                    "procedure; using model.covparam as covparam0_prior. "
                    "Pass covparam0_prior explicitly to avoid this coupling.",
                    stacklevel=2,
                )
            covparam0_prior = model.covparam
        elif covparam_initial_guess is not None:
            covparam0_prior = covparam_initial_guess
        else:
            covparam0_prior = anisotropic_parameters_initial_guess(
                model, xi, zi, dataloader
            )

    return covparam0_prior, covparam0_init


def resolve_logsigma2_logrho_prior_args(
    *,
    covparam0_prior,
    xi=None,
    dataloader=None,
    prior_gamma=None,
    prior_sigma2_coverage=None,
    prior_alpha=None,
    prior_rho_min_range_factor=None,
    prior_log_sigma2_0=None,
    prior_logrho_0=None,
    prior_logrho_min=None,
):
    """Resolve all hyperparameters of the gaussian-logsigma2 + logrho prior."""
    prior_gamma, prior_sigma2_coverage, prior_alpha, prior_rho_min_range_factor = (
        resolve_prior_defaults_for_selection(
            xi=xi,
            dataloader=dataloader,
            gamma=prior_gamma,
            sigma2_coverage=prior_sigma2_coverage,
            alpha=prior_alpha,
            rho_min_range_factor=prior_rho_min_range_factor,
        )
    )

    prior_log_sigma2_0 = (
        covparam0_prior[0] if prior_log_sigma2_0 is None else prior_log_sigma2_0
    )
    prior_logrho_0 = -covparam0_prior[1:] if prior_logrho_0 is None else prior_logrho_0
    prior_logrho_0 = gnp.asarray(prior_logrho_0)

    if prior_logrho_min is None:
        if xi is not None:
            xi_for_min = xi
        elif dataloader is not None and hasattr(dataloader, "dataset"):
            ds = dataloader.dataset
            if hasattr(ds, "x_list"):
                xi_for_min = (
                    gnp.concatenate(ds.x_list, axis=0)
                    if isinstance(ds.x_list, list)
                    else ds.x_list
                )
            else:
                raise ValueError(
                    "dataloader.dataset must provide x_list when "
                    "prior_logrho_min is None."
                )
        else:
            raise ValueError(
                "xi or dataloader.dataset.x_list must be provided when "
                "prior_logrho_min is None."
            )
        prior_logrho_min = compute_logrho_min_from_xi(
            xi_for_min, prior_rho_min_range_factor=prior_rho_min_range_factor
        )
    prior_logrho_min = gnp.asarray(prior_logrho_min)

    return (
        prior_gamma,
        prior_sigma2_coverage,
        prior_alpha,
        prior_rho_min_range_factor,
        prior_log_sigma2_0,
        prior_logrho_0,
        prior_logrho_min,
    )
