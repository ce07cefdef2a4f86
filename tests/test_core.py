# tests/test_core.py
"""Core GP math vs independent NumPy oracles (kriging, NLL/REML, LOO,
Fisher, sample paths)."""

import numpy as np
import pytest
import scipy.linalg
import scipy.spatial.distance
import scipy.special

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.core import likelihood
from gpmp_tpu.config import get_chol_engine, set_chol_engine


# ------------------------- fixtures / oracles -------------------------
def _maternp_oracle(p, h):
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


P_SMOOTH = 3


def _cov_oracle(x, y, param, pairwise=False):
    sigma2 = np.exp(param[0])
    invrho = np.exp(param[1:])
    if y is None or y is x:
        if pairwise:
            return sigma2 * np.ones(x.shape[0])
        D = scipy.spatial.distance.cdist(invrho * x, invrho * x)
        K = sigma2 * _maternp_oracle(P_SMOOTH, D)
        return K + 10.0 * sigma2 * np.finfo(np.float64).eps * np.eye(x.shape[0])
    D = scipy.spatial.distance.cdist(invrho * x, invrho * y)
    return sigma2 * _maternp_oracle(P_SMOOTH, D)


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel_fn(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, P_SMOOTH, covparam, pairwise)


def _make_data(n=20, d=2, seed=0):
    rng = np.random.default_rng(seed)
    xi = rng.uniform(size=(n, d))
    zi = np.sin(3 * xi[:, 0]) + 0.5 * np.cos(5 * xi[:, -1])
    xt = rng.uniform(size=(7, d))
    covparam = np.array([np.log(1.3)] + [np.log(1.0 / 0.7)] * d)
    return xi, zi, xt, covparam


# ----------------------------- predict -----------------------------
def test_predict_zero_mean_matches_oracle():
    xi, zi, xt, covparam = _make_data()
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    zpm, zpv = model.predict(xi, zi, xt)

    K = _cov_oracle(xi, xi, covparam)
    Kit = _cov_oracle(xi, xt, covparam)
    lam = np.linalg.solve(K, Kit)
    zpm_ref = lam.T @ zi
    zpv_ref = np.exp(covparam[0]) * np.ones(xt.shape[0]) - np.einsum(
        "ij,ij->j", lam, Kit
    )
    np.testing.assert_allclose(zpm, zpm_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(zpv, np.maximum(zpv_ref, 0), rtol=1e-7, atol=1e-9)


def test_predict_linear_predictor_matches_block_oracle():
    """Universal kriging: nullspace route must equal the saddle-point
    block-system solution (reference primary path, kriging.py:94-114)."""
    xi, zi, xt, covparam = _make_data(n=15)
    model = gp.Model(constant_mean, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="linear_predictor")
    zpm, zpv = model.predict(xi, zi, xt)

    n = xi.shape[0]
    K = _cov_oracle(xi, xi, covparam)
    P = np.ones((n, 1))
    Kit = _cov_oracle(xi, xt, covparam)
    Pt = np.ones((xt.shape[0], 1))
    LHS = np.block([[K, P], [P.T, np.zeros((1, 1))]])
    RHS = np.vstack([Kit, Pt.T])
    lammu = np.linalg.solve(LHS, RHS)
    lam = lammu[:n]
    zpm_ref = lam.T @ zi
    zpv_ref = np.exp(covparam[0]) * np.ones(xt.shape[0]) - np.einsum(
        "ij,ij->j", lammu, RHS
    )
    np.testing.assert_allclose(zpm, zpm_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(zpv, np.maximum(zpv_ref, 0), rtol=1e-6, atol=1e-8)


def parameterized_constant_mean(x, param):
    return param[0] * gnp.ones((x.shape[0], 1))


def test_predict_parameterized_mean():
    xi, zi, xt, covparam = _make_data(n=12)
    model = gp.Model(
        parameterized_constant_mean,
        kernel_fn,
        meanparam=gnp.asarray(np.array([0.7])),
        covparam=gnp.asarray(covparam),
        meantype="parameterized",
    )
    zpm, zpv = model.predict(xi, zi, xt)
    # oracle: center by 0.7, zero-mean predict, add back
    K = _cov_oracle(xi, xi, covparam)
    Kit = _cov_oracle(xi, xt, covparam)
    lam = np.linalg.solve(K, Kit)
    zpm_ref = lam.T @ (zi - 0.7) + 0.7
    np.testing.assert_allclose(zpm, zpm_ref, rtol=1e-9, atol=1e-10)


# ----------------------------- likelihoods -----------------------------
def test_nll_zero_mean_matches_oracle():
    xi, zi, _, covparam = _make_data()
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    nll = float(model.negative_log_likelihood_zero_mean(
        gnp.asarray(covparam), gnp.asarray(xi), gnp.asarray(zi)))
    K = _cov_oracle(xi, xi, covparam)
    n = K.shape[0]
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(K, zi)
    nll_ref = 0.5 * (
        n * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + zi @ alpha
    )
    np.testing.assert_allclose(nll, nll_ref, rtol=1e-10)


def _reml_oracle(xi, zi, covparam):
    """Contrast-space REML oracle (reference likelihood.py:92-129)."""
    n = xi.shape[0]
    K = _cov_oracle(xi, xi, covparam)
    P = np.ones((n, 1))
    Q, _R = np.linalg.qr(P, mode="complete")
    W = Q[:, 1:]
    Wz = W.T @ zi
    G = W.T @ K @ W
    C = np.linalg.cholesky(G)
    alpha = np.linalg.solve(G, Wz)
    q = 1
    return 0.5 * (
        (n - q) * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(C))) + Wz @ alpha
    )


def test_reml_profiled_equals_contrast_and_oracle():
    xi, zi, _, covparam = _make_data(n=18)
    model = gp.Model(constant_mean, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="linear_predictor")
    xi_, zi_ = gnp.asarray(xi), gnp.asarray(zi)
    cp = gnp.asarray(covparam)
    L_prof = float(likelihood.negative_log_restricted_likelihood(
        model, cp, xi_, zi_, impl="profiled"))
    L_ctr = float(likelihood.negative_log_restricted_likelihood(
        model, cp, xi_, zi_, impl="contrast"))
    L_ref = _reml_oracle(xi, zi, covparam)
    np.testing.assert_allclose(L_prof, L_ref, rtol=1e-9)
    np.testing.assert_allclose(L_ctr, L_ref, rtol=1e-9)


def test_nll_nonpd_gives_inf():
    # a kernel with huge variance and coincident points -> singular matrix
    xi = np.zeros((5, 1))
    zi = np.ones(5)
    covparam = np.array([0.0, 0.0])

    def bad_kernel(x, y, p, pairwise=False):
        # rank-1 covariance: ones matrix (singular, Cholesky fails)
        if pairwise:
            return gnp.ones((x.shape[0],))
        return gnp.ones((x.shape[0], (x if y is None else y).shape[0]))

    model = gp.Model(None, bad_kernel, covparam=gnp.asarray(covparam),
                     meantype="zero")
    nll = model.negative_log_likelihood_zero_mean(
        gnp.asarray(covparam), gnp.asarray(xi), gnp.asarray(zi))
    assert float(nll) == np.inf


# ----------------------------- LOO -----------------------------
def test_loo_zero_mean_matches_bruteforce():
    xi, zi, _, covparam = _make_data(n=14)
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    zloo, sigma2loo, eloo = model.loo(xi, zi)

    # brute-force LOO with the oracle covariance
    n = xi.shape[0]
    zloo_ref = np.empty(n)
    s2_ref = np.empty(n)
    for i in range(n):
        mask = np.arange(n) != i
        K = _cov_oracle(xi[mask], xi[mask], covparam)
        k = _cov_oracle(xi[mask], xi[i:i + 1], covparam).reshape(-1)
        lam = np.linalg.solve(K, k)
        zloo_ref[i] = lam @ zi[mask]
        s2_ref[i] = np.exp(covparam[0]) - lam @ k
    np.testing.assert_allclose(np.asarray(zloo), zloo_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sigma2loo), s2_ref, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(eloo), zi - zloo_ref, rtol=1e-6,
                               atol=1e-8)


def test_loo_linear_predictor_consistency():
    xi, zi, _, covparam = _make_data(n=13)
    model = gp.Model(constant_mean, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="linear_predictor")
    zloo, sigma2loo, eloo = model.loo(xi, zi)
    # brute-force universal-kriging LOO
    n = xi.shape[0]
    zloo_ref = np.empty(n)
    for i in range(n):
        mask = np.arange(n) != i
        K = _cov_oracle(xi[mask], xi[mask], covparam)
        P = np.ones((n - 1, 1))
        k = _cov_oracle(xi[mask], xi[i:i + 1], covparam).reshape(-1)
        LHS = np.block([[K, P], [P.T, np.zeros((1, 1))]])
        RHS = np.concatenate([k, [1.0]])
        lammu = np.linalg.solve(LHS, RHS)
        zloo_ref[i] = lammu[: n - 1] @ zi[mask]
    np.testing.assert_allclose(np.asarray(zloo), zloo_ref, rtol=1e-6, atol=1e-7)


# ----------------------------- Fisher -----------------------------
def test_fisher_information_ad_vs_fd():
    from gpmp_tpu.core.fisher import fisher_information_fd

    xi, zi, _, covparam = _make_data(n=10)
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    I_ad = np.asarray(model.fisher_information(gnp.asarray(xi)))
    I_fd = np.asarray(fisher_information_fd(model, gnp.asarray(xi),
                                            epsilon=1e-4))
    np.testing.assert_allclose(I_ad, I_fd, rtol=1e-5, atol=1e-7)
    # symmetry + PSD
    np.testing.assert_allclose(I_ad, I_ad.T, rtol=1e-12)
    assert np.all(np.linalg.eigvalsh(I_ad) > -1e-8)


def test_fisher_information_hessian_variant():
    xi, zi, _, covparam = _make_data(n=8)
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    H = np.asarray(model.fisher_information_torch(gnp.asarray(xi),
                                                  gnp.asarray(covparam)))
    assert H.shape == (3, 3)
    assert np.all(np.isfinite(H))


# ----------------------------- sample paths -----------------------------
def test_sample_paths_moments():
    xi, zi, xt, covparam = _make_data(n=6, d=1, seed=3)
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    gnp.set_seed(0)
    xt_grid = np.linspace(0, 1, 30).reshape(-1, 1)
    paths = np.asarray(model.sample_paths(xt_grid, 4000))
    assert paths.shape == (30, 4000)
    K = _cov_oracle(xt_grid, xt_grid, covparam)
    emp_cov = paths @ paths.T / 4000
    np.testing.assert_allclose(emp_cov, K, atol=0.15)


def test_conditional_sample_paths_interpolate():
    """Conditioned paths must pass through the observations."""
    covparam = np.array([0.0, np.log(1 / 0.4)])
    model = gp.Model(None, kernel_fn, covparam=gnp.asarray(covparam),
                     meantype="zero")
    xall = np.linspace(0, 1, 25).reshape(-1, 1)
    xi_ind = np.array([2, 10, 20])
    xi = xall[xi_ind]
    zi = np.sin(5 * xi).reshape(-1)
    gnp.set_seed(1)
    ztsim = model.sample_paths(xall, 8)
    _zpm, _zpv, lam = model.predict(xi, zi, xall, return_lambdas=True)
    ztsimc = model.conditional_sample_paths(
        ztsim, xi_ind, zi, np.arange(25), lam
    )
    np.testing.assert_allclose(
        np.asarray(ztsimc)[xi_ind, :], np.tile(zi.reshape(-1, 1), (1, 8)),
        atol=1e-6,
    )


def test_loo_mixed_engine_matches_f64():
    """Mixed-engine LOO (series diag(K^{-1}) + profiled linear-predictor
    path) against the f64 oracle, both meantypes."""
    import os

    import jax.numpy as jnp

    import gpmp_tpu as gp
    from gpmp_tpu.core import loo as cloo

    n, d, p = 300, 4, 2
    rng = np.random.default_rng(0)
    xi_np = rng.uniform(size=(n, d))
    zi_np = np.sin(3 * xi_np[:, 0]) + 0.1 * rng.normal(size=n)

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, param, pairwise=False):
        s2 = gnp.exp(param[0])
        li = param[2:]
        if y is x or y is None:
            nv = gnp.exp(param[1])
            if pairwise:
                return s2 * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(li, x, x)
            return s2 * gp.kernel.maternp_kernel(p, K) + nv * gnp.eye(
                K.shape[0]
            )
        if pairwise:
            K = gnp.scaled_distance_elementwise(li, x, y)
        else:
            K = gnp.scaled_distance(li, x, y)
        return s2 * gp.kernel.maternp_kernel(p, K)

    xi, zi = gnp.asarray(xi_np), gnp.asarray(zi_np)
    covparam = gnp.asarray(
        np.concatenate([[0.0], [-4.0], -np.log(np.std(xi_np, axis=0))])
    )
    model = gp.Model(constant_mean, kernel)
    model.covparam = covparam

    cases = [
        lambda: cloo._loo_with_zero_mean(model, covparam, xi, zi),
        lambda: cloo._loo_with_linear_predictor_mean_cpd(
            model, None, covparam, xi, zi
        ),
    ]
    prev = get_chol_engine()
    try:
        for fn in cases:
            set_chol_engine("f64")
            ref = fn()
            set_chol_engine("mixed")
            mix = fn()
            for a, b in zip(ref, mix):
                rel = float(
                    jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a))
                )
                assert rel < 1e-8
    finally:
        set_chol_engine(prev)
