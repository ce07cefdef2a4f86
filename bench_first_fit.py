#!/usr/bin/env python
"""First-fit wall-clock probe: end-to-end REML fit at n=1000, d=6 in a
fresh process (the out-of-box UX number from BENCHMARKS.md).

Prints ONE JSON line with phase timings.  Run twice: the first run in a
fresh cache populates the persistent XLA cache ("cold"), the second
measures the warm path.
"""

import json
import time

t_proc0 = time.perf_counter()

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp

t_import = time.perf_counter() - t_proc0


def main():
    ni, d = 1000, 6
    rng = np.random.default_rng(0)
    xi = rng.uniform(size=(ni, d))
    zi = np.sin(3 * xi[:, 0]) + 0.5 * np.cos(5 * xi[:, 1]) + xi[:, 2] ** 2
    zi = zi + 0.1 * rng.standard_normal(ni)

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, covparam, pairwise=False):
        return gp.kernel.maternp_covariance(x, y, 2, covparam, pairwise)

    model = gp.Model(constant_mean, kernel)

    t0 = time.perf_counter()
    model, info = gp.kernel.select_parameters_with_reml(model, xi, zi, info=True)
    t_fit = time.perf_counter() - t0

    t0 = time.perf_counter()
    xt = rng.uniform(size=(512, d))
    zpm, zpv = model.predict(xi, zi, xt)
    np.asarray(zpm)
    t_predict = time.perf_counter() - t0

    print(json.dumps({
        "metric": "first_fit_wall_s",
        "import_s": round(t_import, 2),
        "fit_s": round(t_fit, 2),
        "predict_s": round(t_predict, 2),
        "total_s": round(time.perf_counter() - t_proc0, 2),
        "n_evals": int(info.nfev) if hasattr(info, "nfev") else None,
        "criterion": float(info.best_value_returned)
        if hasattr(info, "best_value_returned") else None,
    }))


if __name__ == "__main__":
    main()
