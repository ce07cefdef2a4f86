"""Mixed-precision Cholesky engine (TPU fast path).

gpmp_tpu example 41 -- no reference counterpart (the reference is
f64-only; gpmp_tpu adds a TPU-native mixed-precision engine).

On TPU, float64 factorizations are software-emulated and slow, while
f64 *matmuls* are comparatively fast.  Setting ``GPMP_CHOL_ENGINE=mixed``
(before or after import -- the engine is read at trace time) switches
the hot paths (REML/NLL criteria and their gradients, kriging solves,
LOO, sample-path factors, init heuristics) to an engine that:

- factorizes in f32 (one MXU-friendly Cholesky + a blocked matmul
  triangular inverse),
- recovers f64 accuracy through matmul-based iterative refinement and
  trace-series logdet/diag identities with an analytic custom VJP,
- stays fail-visible: beyond the f32 conditioning range (~1e7) results
  become NaN, which the selection criteria map to +inf exactly like a
  failed f64 factorization.

Measured on a TPU v5e at n=1000, d=6 (vs the same engine in f64):
criterion value+grad ~4x, LOO ~9x, sampling factor ~17x; vs the
reference's torch-CPU backend the criterion is ~23x.

This example just demonstrates equivalence on a small problem, so it
runs anywhere (CPU included) in seconds.
"""

import os

import numpy as np

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.config import get_chol_engine, set_chol_engine


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel(x, y, covparam, pairwise=False):
    p = 2
    sigma2 = gnp.exp(covparam[0])
    noise_variance = gnp.exp(covparam[1])
    loginvrho = covparam[2:]
    if y is x or y is None:
        if pairwise:
            return sigma2 * gnp.ones((x.shape[0],))
        K = gnp.scaled_distance(loginvrho, x, x)
        return sigma2 * gp.kernel.maternp_kernel(p, K) + (
            noise_variance * gnp.eye(K.shape[0])
        )
    if pairwise:
        K = gnp.scaled_distance_elementwise(loginvrho, x, y)
    else:
        K = gnp.scaled_distance(loginvrho, x, y)
    return sigma2 * gp.kernel.maternp_kernel(p, K)


def main(show=False):
    rng = np.random.default_rng(0)
    ni, d = 400, 3
    xi = rng.uniform(size=(ni, d))
    zi = (
        np.sin(3 * xi[:, 0])
        + 0.5 * np.cos(5 * xi[:, 1])
        + 0.1 * rng.normal(size=ni)
    )
    xt = rng.uniform(size=(50, d))

    covparam0 = gnp.asarray(
        np.concatenate(
            [
                [np.log(np.var(zi))],
                [2 * np.log(0.1) + np.log(np.var(zi))],
                -np.log(np.std(xi, axis=0)),
            ]
        )
    )
    xi_, zi_ = gnp.asarray(xi), gnp.asarray(zi)

    results = {}
    prev = get_chol_engine()
    try:
        for engine in ("f64", "mixed"):
            set_chol_engine(engine)
            model = gp.Model(constant_mean, kernel)
            model, info = gp.kernel.select_parameters_with_reml(
                model, xi_, zi_, info=True, covparam0=covparam0
            )
            zpm, zpv = model.predict(xi_, zi_, gnp.asarray(xt))
            zloo, sigma2loo, _ = model.loo(xi_, zi_)
            results[engine] = dict(
                covparam=np.asarray(model.covparam),
                crit=float(info.fun),
                zpm=np.asarray(zpm),
                zloo=np.asarray(zloo),
            )
            print(f"[{engine:5s}] REML criterion {info.fun:.6f}, "
                  f"{info.nfev} evals, {info.total_time:.1f}s")
    finally:
        set_chol_engine(prev)

    # fit-to-fit agreement: optimizer-path noise only (each engine's
    # criterion differs at ~1e-10, so SLSQP may stop a step apart)
    dcrit = abs(results["mixed"]["crit"] - results["f64"]["crit"])
    dpred = np.max(np.abs(results["mixed"]["zpm"] - results["f64"]["zpm"]))
    dloo = np.max(np.abs(results["mixed"]["zloo"] - results["f64"]["zloo"]))
    print(f"fit-to-fit agreement: criterion {dcrit:.2e}, "
          f"predict {dpred:.2e}, LOO {dloo:.2e}")
    assert dcrit < 1e-3 and dpred < 1e-3 and dloo < 1e-3

    # engine parity proper: same covparam, f64 vs mixed predictions
    model = gp.Model(constant_mean, kernel)
    model.covparam = gnp.asarray(results["f64"]["covparam"])
    prev = get_chol_engine()
    try:
        set_chol_engine("f64")
        zpm_a, _ = model.predict(xi_, zi_, gnp.asarray(xt))
        set_chol_engine("mixed")
        zpm_b, _ = model.predict(xi_, zi_, gnp.asarray(xt))
    finally:
        set_chol_engine(prev)
    dpar = float(np.max(np.abs(np.asarray(zpm_a) - np.asarray(zpm_b))))
    print(f"engine parity at fixed covparam: predict {dpar:.2e}")
    assert dpar < 1e-7
    return results


if __name__ == "__main__":
    main()
