#!/usr/bin/env python
"""Run every example on the real TPU chip and write TPU_SWEEP_r{N}.json.

Auditable evidence for the "all examples run on real TPU" claim
(VERDICT r2 item 9): per-example status + wall-clock, produced by
driver-style subprocess runs (python examples/<script>.py) on the
default (axon TPU) platform, matplotlib pinned headless.

Usage: python tpu_sweep.py [--round N] [--timeout S]
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=1200)
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    scripts = sorted(glob.glob(os.path.join(here, "examples",
                                            "gpmp_tpu_example*.py")))
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    # APPEND the repo to PYTHONPATH: replacing it would drop this
    # environment's sitecustomize dir (/root/.axon_site), which is what
    # registers the axon TPU backend.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), here) if p
    )

    results = []
    for path in scripts:
        name = os.path.basename(path)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, path], env=env, cwd=here,
                capture_output=True, text=True, timeout=args.timeout,
            )
            status = "pass" if r.returncode == 0 else "fail"
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        except subprocess.TimeoutExpired:
            status, tail = "timeout", []
        wall = round(time.perf_counter() - t0, 1)
        results.append({"example": name, "status": status, "wall_s": wall,
                        **({"tail": tail} if status == "fail" else {})})
        print(f"{name}: {status} ({wall}s)", file=sys.stderr, flush=True)

    out = {
        "platform": "tpu (axon tunnel, default jax platform)",
        "date": time.strftime("%Y-%m-%d"),
        "n_examples": len(results),
        "n_pass": sum(r["status"] == "pass" for r in results),
        "results": results,
    }
    out_path = os.path.join(here, f"TPU_SWEEP_r{args.round:02d}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": out_path, "n_pass": out["n_pass"],
                      "n_examples": out["n_examples"]}))


if __name__ == "__main__":
    main()
