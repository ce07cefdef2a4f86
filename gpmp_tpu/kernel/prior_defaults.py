# gpmp_tpu/kernel/prior_defaults.py
"""Default hyperparameters for kernel prior models.

Reference semantics: /root/reference/gpmp/kernel/prior_defaults.py:23-175.
"""

from dataclasses import dataclass


@dataclass
class _PriorDefaults:
    gamma: float = 1.5
    sigma2_coverage: float = 0.95
    alpha: float = 1.0
    rho_min_range_factor: float = 1 / 20.0


_PRIOR_DEFAULTS = _PriorDefaults()


def _validate_xi_shape(xi):
    if xi is not None and hasattr(xi, "shape"):
        if len(tuple(xi.shape)) != 2:
            raise ValueError("xi must have shape (n, d).")


def get_default_prior_hyperparameters(xi=None):
    """Current prior-default hyperparameters as a dict."""
    _validate_xi_shape(xi)
    return {
        "gamma": _PRIOR_DEFAULTS.gamma,
        "sigma2_coverage": _PRIOR_DEFAULTS.sigma2_coverage,
        "alpha": _PRIOR_DEFAULTS.alpha,
        "rho_min_range_factor": _PRIOR_DEFAULTS.rho_min_range_factor,
    }


def set_default_prior_hyperparameters(
    *, gamma=None, sigma2_coverage=None, alpha=None, rho_min_range_factor=None
):
    """Update one or more default prior hyperparameters (validated)."""
    if gamma is not None:
        gamma = float(gamma)
        if gamma <= 1.0:
            raise ValueError("gamma must be > 1.")
        _PRIOR_DEFAULTS.gamma = gamma
    if sigma2_coverage is not None:
        sigma2_coverage = float(sigma2_coverage)
        if not (0.0 < sigma2_coverage < 1.0):
            raise ValueError("sigma2_coverage must be in (0, 1).")
        _PRIOR_DEFAULTS.sigma2_coverage = sigma2_coverage
    if alpha is not None:
        alpha = float(alpha)
        if alpha <= 0.0:
            raise ValueError("alpha must be > 0.")
        _PRIOR_DEFAULTS.alpha = alpha
    if rho_min_range_factor is not None:
        rho_min_range_factor = float(rho_min_range_factor)
        if rho_min_range_factor <= 0.0:
            raise ValueError("rho_min_range_factor must be > 0.")
        _PRIOR_DEFAULTS.rho_min_range_factor = rho_min_range_factor


def set_default_prior_hyperparameters_from_kwargs(kwargs):
    """Update prior defaults from kwargs in place; recognized keys popped."""
    if "prior_logsigma2_gamma" in kwargs:
        set_default_prior_hyperparameters(gamma=kwargs.pop("prior_logsigma2_gamma"))
    if "prior_logsigma2_coverage" in kwargs:
        set_default_prior_hyperparameters(
            sigma2_coverage=kwargs.pop("prior_logsigma2_coverage")
        )
    if "prior_logrho_alpha" in kwargs:
        set_default_prior_hyperparameters(alpha=kwargs.pop("prior_logrho_alpha"))
    if "prior_logrho_min_range_factor" in kwargs:
        set_default_prior_hyperparameters(
            rho_min_range_factor=kwargs.pop("prior_logrho_min_range_factor")
        )


def resolve_prior_defaults_for_selection(
    xi=None,
    dataloader=None,
    gamma=None,
    sigma2_coverage=None,
    alpha=None,
    rho_min_range_factor=None,
):
    """Resolve prior defaults, concatenating loader shards for xi if needed."""
    xi_for_defaults = xi
    if (
        xi_for_defaults is None
        and dataloader is not None
        and hasattr(dataloader, "dataset")
    ):
        ds = dataloader.dataset
        if hasattr(ds, "x_list"):
            import gpmp_tpu.num as gnp

            xi_for_defaults = (
                gnp.concatenate(ds.x_list, axis=0)
                if isinstance(ds.x_list, list)
                else ds.x_list
            )

    defaults = get_default_prior_hyperparameters(xi_for_defaults)
    if gamma is None:
        gamma = defaults["gamma"]
    if sigma2_coverage is None:
        sigma2_coverage = defaults["sigma2_coverage"]
    if alpha is None:
        alpha = defaults["alpha"]
    if rho_min_range_factor is None:
        rho_min_range_factor = defaults["rho_min_range_factor"]
    return gamma, sigma2_coverage, alpha, rho_min_range_factor
