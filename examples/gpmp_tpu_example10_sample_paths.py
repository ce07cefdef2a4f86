"""Unconditional and conditional GP sample paths (conditioning by kriging).

Mirror of reference examples/gpmp_example10_sample_paths.py.
"""

import math

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp


def generate_data():
    nt = 200
    xt = np.linspace(-1, 1, nt).reshape(-1, 1)
    zt = gp.misc.testfunctions.twobumps(xt)
    ind = [10, 45, 100, 130, 155]
    return xt, zt, xt[ind], zt[ind], ind


def kernel(x, y, covparam, pairwise=False):
    p = 2
    return gp.kernel.maternp_covariance(x, y, p, covparam, pairwise)


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def main(show=False, n_paths=6, seed=0):
    xt, zt, xi, zi, xi_ind = generate_data()

    covparam = gnp.asarray(np.array([math.log(0.5**2), math.log(1 / 0.7)]))
    model = gp.Model(constant_mean, kernel, None, covparam)

    # prior sample paths on the full grid
    gnp.set_seed(seed)
    ztsim = model.sample_paths(xt, n_paths)

    # kriging weights, reused for conditioning
    zpm, zpv, lam = model.predict(xi, zi, xt, return_lambdas=True)

    # conditioning by kriging
    ztsimc = model.conditional_sample_paths(
        ztsim, np.asarray(xi_ind), zi, np.arange(xt.shape[0]), lam
    )

    # conditioned paths interpolate the observations
    assert np.allclose(
        np.asarray(ztsimc)[xi_ind, :], np.tile(zi.reshape(-1, 1), (1, n_paths)),
        atol=1e-6,
    )

    if show:
        fig = gp.plot.Figure(isinteractive=True)
        fig.plot(xt, zt, "C2", linewidth=1, label="truth")
        fig.plot(xt, np.asarray(ztsimc), "C0", linewidth=1)
        fig.plotdata(xi, zi)
        fig.plotgp(xt, zpm, zpv)
        fig.title("Conditional sample paths")
        fig.legend()
        fig.show()
    return ztsim, ztsimc


if __name__ == "__main__":
    main(show=True)
