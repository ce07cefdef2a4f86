#!/usr/bin/env python
"""n=32768 single-chip streamed-recompute probe (VERDICT r4 item 2).

Forces the streamed engine into recompute mode at n=32768 on the real
chip and attempts (1) the REML value program, (2) value+grad.  On OOM
the XLA error text (which carries the largest-buffer table) is captured
to stderr so the residual (n, n) temps can be identified.

Usage: python tools/probe32k.py [--n 32768] [--what value|grad|both]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--what", choices=["value", "grad", "both"],
                    default="both")
    ap.add_argument("--mode", default="recompute")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import jax
    from gpmp_tpu.config import set_chol_engine
    import gpmp_tpu.num as gnp
    import gpmp_tpu.parallel.streamed as st
    from gpmp_tpu.parallel import make_mesh
    from gpmp_tpu.parallel.likelihood import (
        sharded_negative_log_restricted_likelihood,
    )
    from bench_large_n import make_data, _build_model

    set_chol_engine("mixed")
    st.STREAM_MIN_N = 1                       # force streamed dispatch
    st.choose_mode = lambda n_, cap_bytes=None: args.mode

    n = args.n
    xi, zi, _xt, covparam = make_data(n)
    model = _build_model()
    mesh = make_mesh(1, axis_name="shard")
    xi_d, zi_d = gnp.asarray(xi), gnp.asarray(zi)
    p0 = gnp.asarray(covparam)

    def crit(p):
        return sharded_negative_log_restricted_likelihood(
            model, p, xi_d, zi_d, mesh)

    if args.what in ("value", "both"):
        t0 = time.perf_counter()
        try:
            v = float(jax.jit(crit)(p0))
            print(f"[value] ok: {v:.6f} in {time.perf_counter()-t0:.1f}s "
                  "(incl. compile)", flush=True)
            ts = []
            for i in range(2):
                t0 = time.perf_counter()
                float(jax.jit(crit)(p0 + 1e-4 * (i + 1)))
                ts.append(time.perf_counter() - t0)
            print(f"[value] steady {min(ts):.2f}s/eval", flush=True)
        except Exception as e:
            print(f"[value] FAILED after {time.perf_counter()-t0:.1f}s",
                  flush=True)
            sys.stderr.write(str(e)[:8000] + "\n")

    if args.what in ("grad", "both"):
        t0 = time.perf_counter()
        try:
            vg = jax.jit(jax.value_and_grad(crit))
            v, g = vg(p0)
            v = float(v)
            g = np.asarray(g)
            print(f"[grad] ok: v={v:.6f} g={g} in "
                  f"{time.perf_counter()-t0:.1f}s (incl. compile)",
                  flush=True)
            ts = []
            for i in range(2):
                t0 = time.perf_counter()
                _v, g = vg(p0 + 1e-4 * (i + 1))
                np.asarray(g)
                ts.append(time.perf_counter() - t0)
            print(f"[grad] steady {min(ts):.2f}s/eval", flush=True)
        except Exception as e:
            print(f"[grad] FAILED after {time.perf_counter()-t0:.1f}s",
                  flush=True)
            sys.stderr.write(str(e)[:8000] + "\n")


if __name__ == "__main__":
    main()
