#!/usr/bin/env python
"""gpmp_tpu benchmark: REML criterion value+grad throughput (the fit hot
path, SURVEY.md section 3.2) at n=1000, d=6, float64.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s", "vs_baseline": N}

vs_baseline: speedup over the reference gpmp torch-CPU backend
(autograd REML value+grad on the same problem), measured in a
subprocess on this machine; falls back to a recorded constant if the
reference is unavailable.
"""

import json
import os
import subprocess
import sys
import time

N, D, P_SMOOTH = 1000, 6, 2
N_EVAL = 20
SEED = 7
# fallback: torch-CPU reference throughput measured on this machine
RECORDED_BASELINE_EVALS_PER_SEC = None

_BASELINE_SCRIPT = r"""
import os, sys, time, json
os.environ["GPMP_BACKEND"] = "torch"
sys.path.insert(0, "/root/reference")
import numpy as np
import gpmp as gp
import gpmp.num as gnp

N, D, P, SEED, N_EVAL = %d, %d, %d, %d, %d
rng = np.random.default_rng(SEED)
xi = rng.uniform(size=(N, D))
zi = np.sin(3 * xi[:, 0]) + 0.5 * np.cos(5 * xi[:, 1])

def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))

def kernel(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, P, covparam, pairwise)

model = gp.Model(constant_mean, kernel)
covparam0 = gp.kernel.anisotropic_parameters_initial_guess(model, xi, zi)
crit, crit_pre, crit_ng, grad = gp.kernel.make_selection_criterion_with_gradient(
    model, gp.kernel.negative_log_restricted_likelihood, xi, zi)
p0 = gnp.to_np(covparam0)
crit_pre(p0); grad(p0)  # warmup
t0 = time.perf_counter()
for i in range(N_EVAL):
    crit_pre(p0 + 0.001 * i)
    grad(p0 + 0.001 * i)
dt = time.perf_counter() - t0
print(json.dumps({"evals_per_sec": N_EVAL / dt}))
"""


def measure_baseline():
    try:
        script = _BASELINE_SCRIPT % (N, D, P_SMOOTH, SEED, max(3, N_EVAL // 4))
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=900,
        )
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                return float(json.loads(line)["evals_per_sec"])
            except Exception:
                continue
    except Exception:
        pass
    return RECORDED_BASELINE_EVALS_PER_SEC


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gpmp_tpu as gp
    import gpmp_tpu.num as gnp

    rng = np.random.default_rng(SEED)
    xi = rng.uniform(size=(N, D))
    zi = np.sin(3 * xi[:, 0]) + 0.5 * np.cos(5 * xi[:, 1])

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, covparam, pairwise=False):
        return gp.kernel.maternp_covariance(x, y, P_SMOOTH, covparam, pairwise)

    model = gp.Model(constant_mean, kernel)
    covparam0 = gp.kernel.anisotropic_parameters_initial_guess(model, xi, zi)

    xi_j, zi_j = gnp.asarray(xi), gnp.asarray(zi)

    vg = jax.jit(
        jax.value_and_grad(
            lambda p: model.negative_log_restricted_likelihood(p, xi_j, zi_j)
        )
    )
    p0 = gnp.asarray(covparam0)
    v, g = vg(p0)
    jax.block_until_ready((v, g))  # compile warmup

    t0 = time.perf_counter()
    for i in range(N_EVAL):
        v, g = vg(p0 + 0.001 * i)
    jax.block_until_ready((v, g))
    dt = time.perf_counter() - t0
    evals_per_sec = N_EVAL / dt

    baseline = measure_baseline()
    vs_baseline = (evals_per_sec / baseline) if baseline else None

    print(
        json.dumps(
            {
                "metric": "reml_nll_grad_evals_per_sec_n1000_d6_f64",
                "value": round(evals_per_sec, 4),
                "unit": "evals/s",
                "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
