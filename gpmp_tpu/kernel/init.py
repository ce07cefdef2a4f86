# gpmp_tpu/kernel/init.py
"""Initialization heuristics for GP covariance parameters.

Reference semantics: /root/reference/gpmp/kernel/init.py:24-66.
rho_j = exp(gammaln(d/2 + 1)/d) / sqrt(pi) * range_j (volume-of-ball
heuristic), then GLS sigma^2 at unit variance.
"""

from math import log

import gpmp_tpu.num as gnp
from .utils import prepare_data


def _dataloader_x_delta(dataloader):
    dataset = dataloader.dataset
    return dataset._reduce_max("x") - dataset._reduce_min("x")


def _covparam_from_sigma2_and_rho(sigma2, rho):
    return gnp.concatenate(
        (gnp.asarray(gnp.log(sigma2)).reshape(1), -gnp.log(rho))
    )


def _rho_heuristic(xi_, dataloader, d, source):
    delta = (
        (gnp.max(xi_, axis=0) - gnp.min(xi_, axis=0))
        if source == "arrays"
        else _dataloader_x_delta(dataloader)
    )
    return gnp.exp(gnp.gammaln(d / 2 + 1) / d) / (gnp.pi**0.5) * delta


def anisotropic_parameters_initial_guess_zero_mean(model, xi=None, zi=None,
                                                   dataloader=None):
    """Anisotropic initialization with zero mean."""
    xi_, zi_, _n, d, source = prepare_data(xi, zi, dataloader)
    rho = _rho_heuristic(xi_, dataloader, d, source)
    covparam = gnp.concatenate((gnp.array([log(1.0)]), -gnp.log(rho)))
    sigma2_fn = lambda x, z: (
        model.norm_k_sqrd_with_zero_mean(x, z, covparam) / x.shape[0]
    )
    sigma2_GLS = (
        sigma2_fn(xi_, zi_) if source == "arrays"
        else dataloader.reduce_mean(sigma2_fn)
    )
    return _covparam_from_sigma2_and_rho(sigma2_GLS, rho)


def anisotropic_parameters_initial_guess_constant_mean(model, xi=None, zi=None,
                                                       dataloader=None):
    """Anisotropic initialization with a parameterized constant mean.
    Returns (meanparam0, covparam0)."""
    xi_, zi_, n, d, source = prepare_data(xi, zi, dataloader)
    rho = _rho_heuristic(xi_, dataloader, d, source)
    covparam = gnp.concatenate((gnp.array([log(1.0)]), -gnp.log(rho)))
    if source == "arrays":
        zTKinvz, Kinv1, Kinvz = model.k_inverses(xi_, zi_, covparam)
        mean_GLS = gnp.sum(Kinvz) / gnp.sum(Kinv1)
        sigma2_GLS = (1.0 / n) * zTKinvz
    else:
        def per_batch_gls(x, z):
            zTKinvz, Kinv1, Kinvz = model.k_inverses(x, z, covparam)
            return gnp.stack(
                [gnp.sum(Kinvz) / gnp.sum(Kinv1), zTKinvz / x.shape[0]], axis=-1
            )
        mean_and_sigma2 = dataloader.reduce_mean(per_batch_gls)
        mean_GLS, sigma2_GLS = mean_and_sigma2[0], mean_and_sigma2[1]
    return mean_GLS.reshape(1), _covparam_from_sigma2_and_rho(sigma2_GLS, rho)


def anisotropic_parameters_initial_guess(model, xi=None, zi=None, dataloader=None):
    """Anisotropic initialization for linear-predictor mean handling."""
    xi_, zi_, n, d, source = prepare_data(xi, zi, dataloader)
    rho = _rho_heuristic(xi_, dataloader, d, source)
    covparam = gnp.concatenate((gnp.array([log(1.0)]), -gnp.log(rho)))
    if source == "arrays":
        sigma2_GLS = (1.0 / n) * model.norm_k_sqrd(xi_, zi_, covparam)
    else:
        def per_batch_sigma2(x, z):
            return model.norm_k_sqrd(x, z, covparam) / x.shape[0]
        sigma2_GLS = dataloader.reduce_mean(per_batch_sigma2)
    return _covparam_from_sigma2_and_rho(sigma2_GLS, rho)
