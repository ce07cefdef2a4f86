"""Conditional sample paths with heteroscedastic noisy observations.

Mirror of reference examples/gpmp_example11_sample_paths_noisy_obs.py:
the per-point noise variance travels as an extra input column; the
kernel adds it on the same-set diagonal only.
"""

import math

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp


def generate_data(seed=0):
    nt = 200
    xt = np.linspace(-1, 1, nt).reshape(-1, 1)
    zt = gp.misc.testfunctions.twobumps(xt)
    ind = [10, 45, 100, 130, 155]
    rng = np.random.default_rng(seed)
    noise_var = np.array([0.0, 0.02, 0.005, 0.0, 0.01])
    xi = xt[ind]
    zi = zt[ind] + np.sqrt(noise_var) * rng.normal(size=len(ind))
    return xt, zt, xi, zi, ind, noise_var


def with_noise_column(x, noise_var):
    x = np.asarray(x)
    nv = (
        np.full((x.shape[0], 1), float(noise_var))
        if np.isscalar(noise_var)
        else np.asarray(noise_var, dtype=float).reshape(-1, 1)
    )
    return np.hstack((x, nv))


def _split(x):
    return x[:, :-1], x[:, -1].reshape(-1)


def kernel(x, y, covparam, pairwise=False):
    p = 2
    sigma2 = gnp.exp(covparam[0])
    loginvrho = covparam[1:]
    if y is x or y is None:
        xc, nv = _split(x)
        if pairwise:
            return sigma2 * gnp.ones((xc.shape[0],)) + nv
        D = gnp.scaled_distance(loginvrho, xc, xc)
        return sigma2 * gp.kernel.maternp_kernel(p, D) + gnp.diag(nv)
    xc, _ = _split(x)
    yc, _ = _split(y)
    if pairwise:
        D = gnp.scaled_distance_elementwise(loginvrho, xc, yc)
    else:
        D = gnp.scaled_distance(loginvrho, xc, yc)
    return sigma2 * gp.kernel.maternp_kernel(p, D)


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def main(show=False, n_paths=6, seed=0):
    xt, zt, xi, zi, xi_ind, noise_var = generate_data(seed)
    xi_f = with_noise_column(xi, noise_var)
    xt_f = with_noise_column(xt, 0.0)

    covparam = gnp.asarray(np.array([math.log(0.5**2), math.log(1 / 0.7)]))
    model = gp.Model(constant_mean, kernel, None, covparam)

    gnp.set_seed(seed)
    ztsim = model.sample_paths(xt_f, n_paths)
    zpm, zpv, lam = model.predict(xi_f, zi, xt_f, return_lambdas=True)
    ztsimc = model.conditional_sample_paths(
        ztsim, np.asarray(xi_ind), zi, np.arange(xt.shape[0]), lam
    )

    if show:
        fig = gp.plot.Figure(isinteractive=True)
        fig.plot(xt, zt, "C2", linewidth=1, label="truth")
        fig.plot(xt, np.asarray(ztsimc), "C0", linewidth=1)
        fig.plotdata(xi, zi)
        fig.plotgp(xt, zpm, zpv)
        fig.title("Conditional sample paths with noisy observations")
        fig.legend()
        fig.show()
    return ztsim, ztsimc


if __name__ == "__main__":
    main(show=True)
