"""1-D GP regression with noisy observations via a noise-flag column.

Mirror of reference examples/gpmp_example06_1d_regression.py: inputs
carry an extra column [coords..., flag], flag=1 marks noisy
observations; the kernel adds noise variance on the diagonal only where
flag=1, so predictions target the latent (noise-free) process.
"""

import math

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp


def generate_data(noise_std, seed=0):
    dim, nt = 1, 200
    box = [[-1], [1]]
    xt = gp.misc.designs.regulargrid(dim, nt, box)
    zt = gp.misc.testfunctions.twobumps(xt)
    rng = np.random.default_rng(seed)
    ind = [10, 45, 100, 130, 130, 130, 131, 132, 133, 133, 133, 134, 160]
    xi = xt[ind]
    zi = zt[ind] + noise_std * rng.normal(size=len(ind))
    return xt, zt, xi, zi


def add_noise_information(x, flag):
    """Append one flag column: 0 latent, 1 noisy."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x.reshape(-1, 1)
    n = x.shape[0]
    f = (
        np.full((n, 1), float(flag))
        if np.isscalar(flag)
        else np.asarray(flag, dtype=float).reshape(n, 1)
    )
    return np.hstack((x, f))


def constant_mean(x, _):
    return gnp.ones((x.shape[0], 1))


def _split(x):
    return x[:, :-1], x[:, -1].reshape(-1)


def kernel_ii_or_tt(x, param, pairwise=False):
    p = 2
    sigma2 = gnp.exp(param[0])
    noise_var = gnp.exp(param[1])
    loginvrho = param[2:]
    x_coord, flag = _split(x)
    if pairwise:
        return sigma2 * gnp.ones((x_coord.shape[0],)) + noise_var * flag
    D = gnp.scaled_distance(loginvrho, x_coord, x_coord)
    K = sigma2 * gp.kernel.maternp_kernel(p, D)
    return K + gnp.diag(noise_var * flag)


def kernel_it(x, y, param, pairwise=False):
    p = 2
    sigma2 = gnp.exp(param[0])
    loginvrho = param[2:]
    x_coord, _ = _split(x)
    y_coord, _ = _split(y)
    if pairwise:
        D = gnp.scaled_distance_elementwise(loginvrho, x_coord, y_coord)
    else:
        D = gnp.scaled_distance(loginvrho, x_coord, y_coord)
    return sigma2 * gp.kernel.maternp_kernel(p, D)


def kernel(x, y, param, pairwise=False):
    if y is x or y is None:
        return kernel_ii_or_tt(x, param, pairwise)
    return kernel_it(x, y, param, pairwise)


def main(show=False, noise_std=0.1):
    xt, zt, xi, zi = generate_data(noise_std)
    xi_f = add_noise_information(xi, 1)  # observations are noisy
    xt_f = add_noise_information(xt, 0)  # targets are latent

    covparam0 = gnp.asarray(
        np.array(
            [math.log(0.5**2), 2.0 * math.log(noise_std), math.log(1 / 0.7)]
        )
    )
    model = gp.Model(constant_mean, kernel, covparam=covparam0)
    model, info = gp.kernel.select_parameters_with_reml(
        model, xi_f, zi, covparam0=covparam0, info=True
    )

    zpm, zpv = model.predict(xi_f, zi, xt_f)

    if show:
        fig = gp.plot.Figure(isinteractive=True)
        fig.plot(xt, zt, "k", linewidth=1, linestyle=(0, (5, 5)))
        fig.plotdata(xi, zi)
        fig.plotgp(xt, zpm, zpv, colorscheme="simple")
        fig.title("Latent-process regression from noisy observations")
        fig.show(grid=True, legend=True)
    return model, zpm, zpv


if __name__ == "__main__":
    main(show=True)
