"""1-D ordinary kriging with a custom user-defined kernel, known params.

Mirror of reference examples/gpmp_example05_1d_custom_kernel.py: shows
the two-part kernel convention (ii/tt path with jitter, it path without)
and prediction without parameter estimation.
"""

import math

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp


def generate_data(seed=0):
    dim, nt = 1, 200
    box = [[-1], [1]]
    xt = gp.misc.designs.regulargrid(dim, nt, box)
    zt = gp.misc.testfunctions.twobumps(xt)
    rng = np.random.default_rng(seed)
    ind = rng.choice(nt, 5, replace=False)
    return xt, zt, xt[ind], zt[ind]


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel_ii_or_tt(x, param, pairwise=False):
    """Same-set covariance with numerical jitter (not observation noise)."""
    p = 2
    sigma2 = gnp.exp(param[0])
    loginvrho = param[1]
    nugget = 100 * gnp.eps
    if pairwise:
        return sigma2 * gnp.ones((x.shape[0],))
    K = gnp.scaled_distance(loginvrho, x, x)
    return sigma2 * gp.kernel.maternp_kernel(p, K) + nugget * gnp.eye(K.shape[0])


def kernel_it(x, y, param, pairwise=False):
    """Cross covariance between distinct point sets."""
    p = 2
    sigma2 = gnp.exp(param[0])
    loginvrho = param[1]
    if pairwise:
        K = gnp.scaled_distance_elementwise(loginvrho, x, y)
    else:
        K = gnp.scaled_distance(loginvrho, x, y)
    return sigma2 * gp.kernel.maternp_kernel(p, K)


def kernel(x, y, param, pairwise=False):
    if y is x or y is None:
        return kernel_ii_or_tt(x, param, pairwise)
    return kernel_it(x, y, param, pairwise)


def main(show=False):
    xt, zt, xi, zi = generate_data()

    covparam = gnp.asarray(np.array([math.log(0.5**2), math.log(1 / 0.7)]))
    model = gp.Model(constant_mean, kernel, covparam=covparam)

    zpm, zpv = model.predict(xi, zi, xt)
    # the kriging predictor interpolates the data
    zpm_at_xi, _ = model.predict(xi, zi, xi)
    assert np.allclose(zpm_at_xi, zi, atol=1e-6)

    if show:
        fig = gp.plot.Figure(isinteractive=True)
        fig.plot(xt, zt, "k", linewidth=1, linestyle=(0, (5, 5)))
        fig.plotdata(xi, zi)
        fig.plotgp(xt, zpm, zpv, colorscheme="simple")
        fig.title("Ordinary kriging with a custom kernel")
        fig.show(grid=True, legend=True)
    return zpm, zpv


if __name__ == "__main__":
    main(show=True)
