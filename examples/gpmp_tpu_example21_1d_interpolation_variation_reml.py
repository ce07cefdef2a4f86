"""REML selection variation study on 1-D interpolation.

Mirror of reference examples/gpmp_example21_*.
"""

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, 3, covparam, pairwise)


def main(show=False, n_repeat=4, ni=8):
    box = [[-1], [1]]
    results = []
    for r in range(n_repeat):
        xi = gp.misc.designs.ldrandunif(1, ni, box, seed=200 + r)
        zi = gp.misc.testfunctions.twobumps(xi)
        model = gp.Model(constant_mean, kernel)
        model, info = gp.kernel.select_parameters_with_reml(
            model, xi, zi, info=True
        )
        results.append(np.asarray(model.covparam))
        print(
            f"draw {r}: covparam = {np.round(results[-1], 3)}, "
            f"J* = {info.fun:.4f}"
        )
    results = np.stack(results)
    print("covparam spread (std over draws):", np.round(results.std(axis=0), 3))
    return results


if __name__ == "__main__":
    main(show=True)
