#!/usr/bin/env python
"""Sampler workload benchmark: gpmp_tpu vs the reference torch-CPU backend.

VERDICT r4 item 5: the posterior-sampling layer (SURVEY 2.5) had never
been benchmarked against the reference itself.  This script runs the
reference example23 workload (1-D twobumps, ni=8, REMAP
gaussian-logsigma2+logrho fit) and then each of the four posterior
samplers at the reference's OWN default budgets
(/root/reference/gpmp/mcmc/param_posterior.py):

  MH    n_steps_total=10_000, burnin_period=4_000, n_chains=2 (:344-348)
  NUTS  num_samples=2_000, num_warmup=1_000, n_chains=2       (:500-501)
  SMC   n_particles=1000, T 1e6 -> 1, mh_steps=20             (:663-669)
  SVGD  n_particles=32, n_steps=500                            (:789-790)

Usage:
  python bench_samplers.py --side reference   # torch-CPU reference
  python bench_samplers.py --side ours        # gpmp_tpu
  python bench_samplers.py                    # both (subprocesses) +
                                              # SAMPLER_BENCH_r05.json

Each side prints ONE JSON line: {"fit_s": ..., "mh_s": ..., ...}.
Wall-clock includes jit compilation for gpmp_tpu (the honest end-to-end
cost a user pays once per session; steady-state rates are in
BENCHMARKS.md's sampler table).
"""

import argparse
import json
import os
import subprocess
import sys
import time

SEED = 123


def _workload(gp, gnp, sample_mh, sample_nuts, sample_smc, sample_svgd,
              seed_kw_nuts=True):
    """Run fit + 4 samplers; return dict of wall-clock seconds."""
    import numpy as np

    out = {}

    dim, ni, nt = 1, 8, 200
    box = [[-1], [1]]
    xt = gp.misc.designs.regulargrid(dim, nt, box)
    try:
        xi = gp.misc.designs.ldrandunif(dim, ni, box, seed=SEED)
    except TypeError:     # reference designs are unseeded (SURVEY 4)
        np.random.seed(SEED)
        xi = gp.misc.designs.ldrandunif(dim, ni, box)
    zi = gp.misc.testfunctions.twobumps(xi)

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, covparam, pairwise=False):
        return gp.kernel.maternp_covariance(x, y, 3, covparam, pairwise)

    model = gp.core.Model(constant_mean, kernel)
    t0 = time.perf_counter()
    model, info = (
        gp.kernel.select_parameters_with_remap_gaussian_logsigma2_and_logrho_prior(
            model, xi, zi, info=True
        )
    )
    out["fit_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    samples, _state = sample_mh(
        info, n_steps_total=10_000, burnin_period=4_000, n_chains=2,
        n_pool=2, silent=True, show_progress=False, plot_chains=False,
        plot_empirical_distributions=False,
    )
    out["mh_s"] = time.perf_counter() - t0
    out["mh_samples_finite"] = bool(np.isfinite(np.asarray(samples)).all())

    t0 = time.perf_counter()
    kw = dict(num_samples=2_000, num_warmup=1_000, n_chains=2,
              progress=False, verbose=0)
    if seed_kw_nuts:
        kw["seed"] = SEED
    samples, _state = sample_nuts(info, **kw)
    out["nuts_s"] = time.perf_counter() - t0
    out["nuts_samples_finite"] = bool(np.isfinite(np.asarray(samples)).all())

    # SMC requires an init box (both sides); take it from the fit's
    # optimizer bounds, as the reference example23 does for NUTS
    init_box = [[b[0] for b in info.bounds], [b[1] for b in info.bounds]]

    t0 = time.perf_counter()
    samples, _state = sample_smc(info, n_particles=1000, init_box=init_box)
    out["smc_s"] = time.perf_counter() - t0
    out["smc_samples_finite"] = bool(np.isfinite(np.asarray(samples)).all())

    t0 = time.perf_counter()
    samples, _state = sample_svgd(
        info, n_particles=32, n_steps=500, progress=False, verbose=0,
    )
    out["svgd_s"] = time.perf_counter() - t0
    out["svgd_samples_finite"] = bool(np.isfinite(np.asarray(samples)).all())
    return out


def run_reference():
    os.environ["GPMP_BACKEND"] = "torch"
    sys.path.insert(0, "/root/reference")
    import matplotlib
    matplotlib.use("Agg")
    import gpmp as gp
    import gpmp.num as gnp
    from gpmp.mcmc.param_posterior import (
        sample_from_selection_criterion_mh,
        sample_from_selection_criterion_nuts,
        sample_from_selection_criterion_smc,
        sample_from_selection_criterion_svgd,
    )

    gnp.set_seed(SEED)
    out = _workload(gp, gnp, sample_from_selection_criterion_mh,
                    sample_from_selection_criterion_nuts,
                    sample_from_selection_criterion_smc,
                    sample_from_selection_criterion_svgd)
    out["side"] = "reference-torch-cpu"
    print(json.dumps(out), flush=True)
    return out


def run_ours():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import matplotlib
    matplotlib.use("Agg")
    import gpmp_tpu as gp
    import gpmp_tpu.num as gnp
    from gpmp_tpu.mcmc.param_posterior import (
        sample_from_selection_criterion_mh,
        sample_from_selection_criterion_nuts,
        sample_from_selection_criterion_smc,
        sample_from_selection_criterion_svgd,
    )

    gnp.set_seed(SEED)
    out = _workload(gp, gnp, sample_from_selection_criterion_mh,
                    sample_from_selection_criterion_nuts,
                    sample_from_selection_criterion_smc,
                    sample_from_selection_criterion_svgd)
    import jax

    out["side"] = "gpmp_tpu-" + jax.devices()[0].platform
    print(json.dumps(out), flush=True)
    return out


def run_both(out_path="SAMPLER_BENCH_r05.json"):
    here = os.path.dirname(os.path.abspath(__file__))

    def _sub(side):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--side", side],
            capture_output=True, text=True, cwd=here, timeout=7200,
        )
        for line in r.stdout.strip().splitlines()[::-1]:
            try:
                return json.loads(line)
            except Exception:
                continue
        raise RuntimeError(
            f"{side} side produced no JSON (rc={r.returncode}):\n"
            + r.stderr[-2000:]
        )

    ours = _sub("ours")
    ref = _sub("reference")
    rows = {}
    for k in ("fit", "mh", "nuts", "smc", "svgd"):
        t_ref, t_ours = ref.get(k + "_s"), ours.get(k + "_s")
        if t_ref and t_ours:
            rows[k] = {
                "reference_s": round(t_ref, 2),
                "gpmp_tpu_s": round(t_ours, 2),
                "speedup": round(t_ref / t_ours, 2),
            }
    out = {
        "metric": "sampler_workloads_example23_defaults",
        "workload": "1d twobumps ni=8, REMAP fit, reference default budgets",
        "ours_platform": ours.get("side"),
        "rows": rows,
        "finite": {k: ours.get(k + "_samples_finite")
                   for k in ("mh", "nuts", "smc", "svgd")},
    }
    line = json.dumps(out)
    print(line, flush=True)
    with open(os.path.join(here, out_path), "w") as f:
        f.write(line + "\n")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["reference", "ours", "both"],
                    default="both")
    args = ap.parse_args()
    if args.side == "reference":
        run_reference()
    elif args.side == "ours":
        run_ours()
    else:
        run_both()


if __name__ == "__main__":
    main()
