# gpmp_tpu/core/model.py
"""Gaussian Process model facade.

API parity with /root/reference/gpmp/core/model.py:22-697; TPU design:
every numerical method is backed by a *pure* function of
(covparam, meanparam, xi, zi, xt) and compiled once per shape with
``jax.jit`` (cached per instance).  The user-facing mutable attributes
(covparam/meanparam) are passed as traced arguments at call time, so
updating them never triggers recompilation.
"""

import warnings

import jax
import numpy as onp

import gpmp_tpu.num as gnp

from . import fisher, kriging, likelihood, linalg, loo
from . import sample_paths as sample_paths_mod
from . import utils


class _BoundParams:
    """Lightweight view binding traced parameters to the model callables,
    so the pure core routines can read .covparam/.meanparam under jit."""

    __slots__ = ("mean", "covariance", "meanparam", "covparam", "meantype")

    def __init__(self, model, covparam, meanparam):
        self.mean = model.mean
        self.covariance = model.covariance
        self.meantype = model.meantype
        self.covparam = covparam
        self.meanparam = meanparam


class Model:
    """Gaussian Process model.

    Parameters
    ----------
    mean : callable or None
        P = mean(x, meanparam), (n, q); None when meantype == 'zero'.
    covariance : callable
        K = covariance(x, y, covparam, pairwise); y may be None (y := x).
    meanparam, covparam : array_like, optional
        1-D parameter vectors.
    meantype : {'zero', 'parameterized', 'linear_predictor'}
    """

    def __init__(self, mean, covariance, meanparam=None, covparam=None,
                 meantype="linear_predictor"):
        utils.validate_model_mean(meantype, mean, meanparam)
        self.meantype = meantype
        self.mean = mean
        self.meanparam = meanparam
        self.covparam = covparam
        self.covariance = covariance
        self._jit_cache = {}

    def __repr__(self):
        return "<gpmp_tpu.core.Model object> " + hex(id(self))

    def __str__(self):
        if self.meantype == "zero":
            mean_desc = "Zero Mean"
        else:
            mean_desc = getattr(self.mean, "__name__", str(self.mean))
        cov_desc = getattr(self.covariance, "__name__", str(self.covariance))
        return (
            f"GP Model:\n"
            f"  Mean Type: {self.meantype}\n"
            f"  Mean Function: {mean_desc}\n"
            f"  Mean Parameters: {self.meanparam}\n"
            f"  Covariance Function: {cov_desc}\n"
            f"  Covariance Parameters: {self.covparam}"
        )

    # ------------------------------------------------------------------
    # jit plumbing
    # ------------------------------------------------------------------
    def _jitted(self, name, builder):
        # the Cholesky engine is read at trace time, so it is part of
        # the cache key: flipping GPMP_CHOL_ENGINE between calls
        # retraces instead of silently reusing the old engine's program
        from .linalg import chol_engine

        key = (name, chol_engine())
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(builder())
            self._jit_cache[key] = fn
        return fn

    def _params(self):
        covparam = None if self.covparam is None else gnp.asarray(self.covparam)
        meanparam = None if self.meanparam is None else gnp.asarray(self.meanparam)
        return covparam, meanparam

    # ------------------------------------------------------------------
    # Kriging predictors
    # ------------------------------------------------------------------
    def kriging_predictor_with_zero_mean(self, xi, xt, return_type=0):
        return kriging.kriging_predictor_with_zero_mean(self, xi, xt, return_type)

    def kriging_predictor(self, xi, xt, return_type=0):
        return kriging.kriging_predictor(self, xi, xt, return_type)

    # ------------------------------------------------------------------
    # Prediction
    # ------------------------------------------------------------------
    def predict(self, xi, zi, xt, return_lambdas=False, zero_neg_variances=True,
                convert_in=True, convert_out=True):
        """Posterior mean/variance at xt given (xi, zi); one jitted kernel.

        Semantics follow reference model.py:227-307 (negative-variance
        warn + clip happens on host after the device computation).
        """
        xi, zi, xt = utils.ensure_shapes_and_type(
            xi=xi, zi=zi, xt=xt, convert=convert_in
        )
        covparam, meanparam = self._params()

        def build():
            def _predict(covparam, meanparam, xi, zi, xt):
                view = _BoundParams(self, covparam, meanparam)
                zi_centered, zt_prior_mean, lambda_t, zt_posterior_variance = (
                    kriging.select_predictor(view, xi, zi, xt)
                )
                zt_posterior_mean = (
                    gnp.einsum("i..., i...", lambda_t, zi_centered) + zt_prior_mean
                )
                return zt_posterior_mean, zt_posterior_variance, lambda_t

            return _predict

        zpm, zpv, lambda_t = self._jitted("predict", build)(
            covparam, meanparam, xi, zi, xt
        )

        if bool(gnp.any(zpv < 0.0)):
            warnings.warn(
                "Negative variances detected. Consider using jitter.",
                RuntimeWarning,
            )
        if zero_neg_variances:
            zpv = gnp.maximum(zpv, 0.0)

        if convert_out:
            zpm = gnp.to_np(zpm)
            zpv = gnp.to_np(zpv)
        if return_lambdas:
            return zpm, zpv, lambda_t
        return zpm, zpv

    def loo(self, xi, zi, convert_in=True, convert_out=False):
        """Leave-one-out predictions via virtual cross-validation."""
        xi_, zi_, _ = utils.ensure_shapes_and_type(xi=xi, zi=zi, convert=convert_in)
        covparam, meanparam = self._params()

        def build():
            def _loo(covparam, meanparam, xi, zi):
                view = _BoundParams(self, covparam, meanparam)
                return loo.loo(view, xi, zi)

            return _loo

        zloo, sigma2loo, eloo = self._jitted("loo", build)(covparam, meanparam,
                                                           xi_, zi_)
        if convert_out:
            zloo, sigma2loo, eloo = map(gnp.to_np, (zloo, sigma2loo, eloo))
        return zloo, sigma2loo, eloo

    # ------------------------------------------------------------------
    # Likelihoods and norms
    # ------------------------------------------------------------------
    def negative_log_likelihood_zero_mean(self, covparam, xi, zi):
        return likelihood.negative_log_likelihood_zero_mean(self, covparam, xi, zi)

    def negative_log_likelihood(self, meanparam, covparam, xi, zi):
        return likelihood.negative_log_likelihood(self, meanparam, covparam, xi, zi)

    def negative_log_restricted_likelihood(self, covparam, xi, zi, impl="profiled"):
        return likelihood.negative_log_restricted_likelihood(
            self, covparam, xi, zi, impl=impl
        )

    def norm_k_sqrd_with_zero_mean(self, xi, zi, covparam):
        return linalg.norm_k_sqrd_with_zero_mean(self, xi, zi, covparam)

    def k_inverses(self, xi, zi, covparam):
        return linalg.k_inverses(self, xi, zi, covparam)

    def norm_k_sqrd(self, xi, zi, covparam):
        return linalg.norm_k_sqrd(self, xi, zi, covparam)

    # ------------------------------------------------------------------
    # Fisher information
    # ------------------------------------------------------------------
    def fisher_information(self, xi, covparam=None, epsilon=1e-3):
        return fisher.fisher_information(self, xi, covparam=covparam, epsilon=epsilon)

    def fisher_information_cpd(self, xi, covparam=None, epsilon=1e-3):
        return fisher.fisher_information_cpd(
            self, xi, covparam=covparam, epsilon=epsilon
        )

    def fisher_information_torch(self, xi, covparam):
        return fisher.fisher_information_torch(self, xi, covparam)

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------
    def sample_paths(self, xt, nb_paths, method="chol", check_result=True, key=None):
        return sample_paths_mod.sample_paths(
            self, xt, nb_paths, method=method, check_result=check_result, key=key
        )

    def conditional_sample_paths(self, ztsim, xi_ind, zi, xt_ind, lambda_t,
                                 convert_out=True):
        return sample_paths_mod.conditional_sample_paths(
            self, ztsim, xi_ind, zi, xt_ind, lambda_t, convert_out=convert_out
        )

    def conditional_sample_paths_parameterized_mean(
        self, ztsim, xi, xi_ind, zi, xt, xt_ind, lambda_t, convert_out=True
    ):
        return sample_paths_mod.conditional_sample_paths_parameterized_mean(
            self, ztsim, xi, xi_ind, zi, xt, xt_ind, lambda_t,
            convert_out=convert_out,
        )

    # ------------------------------------------------------------------
    # Helpers
    # ------------------------------------------------------------------
    @staticmethod
    def _ensure_shapes_and_type(*, xi=None, zi=None, xt=None, convert=True):
        return utils.ensure_shapes_and_type(xi=xi, zi=zi, xt=xt, convert=convert)

    @staticmethod
    def _validate_model_mean(meantype, mean, meanparam):
        return utils.validate_model_mean(meantype, mean, meanparam)
