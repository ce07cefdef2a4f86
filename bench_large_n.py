#!/usr/bin/env python
"""Large-n north-star artifact (BASELINE.json config 5; SURVEY section 6).

Scripted, reproducible evidence for the sharded exact-GP path at the
scale the target metric names ("REML fit + posterior predict at n=50k
float64 matching the NumPy reference to 1e-8"):

  python bench_large_n.py --mode parity --n 51200
      8-virtual-device CPU mesh: sharded REML criterion value and
      sharded universal-kriging predict at n, float64, compared
      against a STREAMED NumPy/SciPy oracle (gram built in row blocks,
      in-place Cholesky).  Prints one JSON line with relative errors.

  python bench_large_n.py --mode oracle-check
      Validates the NumPy oracle itself against the in-repo Model API
      at small n (so the 50k run measures the sharded path, not oracle
      drift).

  python bench_large_n.py --mode scale --n 8192 [--engine mixed]
      Real-TPU wall-clock of the sharded REML value and value+grad at
      n (single chip or mesh).  Prints one JSON line.

The kernel is the noisy anisotropic Matern (p=2) used by the n-D
regression benchmarks: covparam = [log sigma2, log noise, -log rho_j].
"""

import argparse
import json
import os
import sys
import time

import numpy as np
from gpmp_tpu.config import get_chol_engine, set_chol_engine


# --------------------------------------------------------------------------
# pinned data + independent NumPy oracle
# --------------------------------------------------------------------------

P_SMOOTH = 2
D = 3
SEED = 20260817
NT = 64


def make_data(n, d=D, seed=SEED):
    rng = np.random.default_rng(seed)
    xi = rng.uniform(size=(n, d))
    zi = (np.sin(3.0 * xi[:, 0]) + 0.5 * xi[:, 1]
          + 0.25 * xi[:, 2] ** 2 + 0.05 * rng.normal(size=n))
    xt = rng.uniform(size=(NT, d))
    covparam = np.concatenate(
        [[np.log(np.var(zi))], [np.log(1e-2)], -np.log(np.std(xi, axis=0))]
    )
    return xi, zi, xt, covparam


def _maternp_np(p, h):
    """Independent Matern p+1/2 correlation (tests/test_core.py oracle)."""
    import scipy.special

    c = 2.0 * np.sqrt(p + 0.5)
    twoch = 2.0 * c * h
    gln = scipy.special.gammaln(np.arange(2 * p + 2))
    poly = np.ones_like(h)
    for i in range(p):
        coef = np.exp(gln[p + 1] - gln[2 * p + 1] + gln[p + i + 1]
                      - gln[i + 1] - gln[p - i + 1])
        poly += coef * twoch ** (p - i)
    return np.exp(-c * h) * poly


def _cross_cov_np(x, y, covparam):
    """sigma2 * matern(d(x, y)) without the noise diagonal."""
    import scipy.spatial.distance

    sigma2 = np.exp(covparam[0])
    invrho = np.exp(covparam[2:])
    Dm = scipy.spatial.distance.cdist(x * invrho, y * invrho)
    return sigma2 * _maternp_np(P_SMOOTH, Dm)


def oracle_reml_and_predict(xi, zi, xt, covparam, block=4096, verbose=True,
                            value_only=False):
    """Streamed NumPy/SciPy REML criterion + UK predict.

    The (n, n) gram is filled block-of-rows at a time into one
    preallocated float64 array and factored IN PLACE (no second n^2
    buffer), so n=50k needs ~20 GB once.  value_only=True skips the
    predict block (the FD gradient oracle only needs the criterion).
    """
    import scipy.linalg

    n = xi.shape[0]
    noise = np.exp(covparam[1])
    t0 = time.perf_counter()
    K = np.empty((n, n), dtype=np.float64)
    for r0 in range(0, n, block):
        r1 = min(r0 + block, n)
        K[r0:r1] = _cross_cov_np(xi[r0:r1], xi, covparam)
    K[np.diag_indices_from(K)] += noise
    if verbose:
        print(f"[oracle] gram built in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    t0 = time.perf_counter()
    c, low = scipy.linalg.cho_factor(K, lower=True, overwrite_a=True)
    if verbose:
        print(f"[oracle] cholesky in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    ldetK = 2.0 * np.sum(np.log(np.diag(c)))

    P = np.ones((n, 1))
    q = P.shape[1]
    rhs = np.concatenate([zi.reshape(-1, 1), P], axis=1)
    X = scipy.linalg.cho_solve((c, low), rhs)
    Kinv_z, Kinv_P = X[:, 0], X[:, 1:]

    # profiled REML, exactly the parallel/likelihood.py formula
    M = P.T @ Kinv_P
    Cm = np.linalg.cholesky(M)
    b = P.T @ Kinv_z
    u = scipy.linalg.solve_triangular(Cm, b, lower=True)
    quad = zi @ Kinv_z - u @ u
    ldetM = 2.0 * np.sum(np.log(np.diag(Cm)))
    _s, ldetPtP = np.linalg.slogdet(P.T @ P)
    reml = 0.5 * ((n - q) * np.log(2.0 * np.pi) + ldetK + ldetM
                  - ldetPtP + quad)
    if value_only:
        return float(reml), None, None

    # universal kriging predict (Schur form, core/kriging.py semantics)
    Kit = _cross_cov_np(xi, xt, covparam)          # (n, nt)
    pt = np.ones((xt.shape[0], 1))
    W = scipy.linalg.cho_solve((c, low), Kit)      # K^{-1} k_t
    beta_rhs = pt.T - P.T @ W                      # (q, nt)
    beta = scipy.linalg.cho_solve(
        (np.linalg.cholesky(M), True), beta_rhs
    )
    lam = W + Kinv_P @ beta                        # (n, nt)
    zpm = lam.T @ zi
    # KKT posterior variance: k_tt - lam^T k_t - mu^T p_t with mu = -beta
    prior_var = np.exp(covparam[0]) + noise
    zpv = (prior_var - np.einsum("ij,ij->j", lam, Kit)
           + np.einsum("qj,jq->j", beta, pt))
    return float(reml), zpm, zpv


# --------------------------------------------------------------------------
# sharded path
# --------------------------------------------------------------------------

def _build_model():
    import gpmp_tpu as gp
    import gpmp_tpu.num as gnp

    def mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, param, pairwise=False):
        sigma2 = gnp.exp(param[0])
        noise = gnp.exp(param[1])
        loginvrho = param[2:]
        if y is x or y is None:
            if pairwise:
                return (sigma2 + noise) * gnp.ones((x.shape[0],))
            Dm = gnp.scaled_distance(loginvrho, x, x)
            return sigma2 * gp.kernel.maternp_kernel(P_SMOOTH, Dm) + (
                noise * gnp.eye(Dm.shape[0])
            )
        if pairwise:
            Dm = gnp.scaled_distance_elementwise(loginvrho, x, y)
        else:
            Dm = gnp.scaled_distance(loginvrho, x, y)
        return sigma2 * gp.kernel.maternp_kernel(P_SMOOTH, Dm)

    return gp.Model(mean, kernel)


def run_parity(n, block, n_devices=8, device="cpu", engine=None):
    """Sharded REML value + predict vs the streamed NumPy oracle.

    device="cpu" (default): virtual n_devices CPU mesh — the multi-device
    correctness run.  device="default": whatever JAX picks (the real TPU
    chip under axon), single-device mesh — the hardware f64 parity run.
    """
    if engine:
        set_chol_engine(engine)
    if device == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={n_devices}",
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        n_devices = 1
        import jax
    import gpmp_tpu.num as gnp
    from gpmp_tpu.parallel import make_mesh, sharded_predict
    from gpmp_tpu.parallel.chol import sharded_cholesky
    from gpmp_tpu.parallel.likelihood import (
        sharded_covariance,
        sharded_negative_log_restricted_likelihood,
    )

    xi, zi, xt, covparam = make_data(n)
    model = _build_model()
    model.covparam = gnp.asarray(covparam)
    mesh = make_mesh(n_devices, axis_name="shard")

    # ONE distributed factorization, shared by the REML value and the
    # predict through the public factor= API (predict-after-fit
    # pattern); the oracle below validates both quantities against its
    # own independent factorization, so the shared factor is fully
    # cross-checked.
    t0 = time.perf_counter()
    K = sharded_covariance(model, gnp.asarray(covparam), gnp.asarray(xi),
                           mesh)
    L = sharded_cholesky(K, mesh, axis_name="shard", block=block)
    jax.block_until_ready(L)
    del K
    t_factor = time.perf_counter() - t0
    print(f"[sharded] gram+cholesky in {t_factor:.1f}s (incl. compile)",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    v_sh = float(sharded_negative_log_restricted_likelihood(
        model, gnp.asarray(covparam), gnp.asarray(xi), gnp.asarray(zi),
        mesh, block=block, factor=L,
    ))
    t_reml = time.perf_counter() - t0
    print(f"[sharded] REML value in {t_reml:.1f}s (incl. compile)",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    zpm_sh, zpv_sh = sharded_predict(model, xi, zi, xt, mesh, block=block,
                                     convert_out=True, factor=L)
    t_pred = time.perf_counter() - t0
    print(f"[sharded] predict in {t_pred:.1f}s (incl. compile)",
          file=sys.stderr, flush=True)
    del L

    v_np, zpm_np, zpv_np = oracle_reml_and_predict(xi, zi, xt, covparam)

    rel = lambda a, b: float(
        np.max(np.abs(np.asarray(a) - np.asarray(b)))
        / max(np.max(np.abs(np.asarray(b))), 1e-300)
    )
    out = {
        "metric": "sharded_reml_predict_parity_vs_numpy_oracle",
        "n": n, "d": D, "dtype": "float64", "mesh_devices": n_devices,
        "block": block,
        "reml_rel_err": abs(v_sh - v_np) / abs(v_np),
        "predict_mean_rel_err": rel(zpm_sh, zpm_np),
        "predict_var_rel_err": rel(zpv_sh, zpv_np),
        "reml_sharded": v_sh, "reml_oracle": v_np,
        "pass_1e-8": bool(
            abs(v_sh - v_np) / abs(v_np) < 1e-8
            and rel(zpm_sh, zpm_np) < 1e-8
            and rel(zpv_sh, zpv_np) < 1e-8
        ),
    }
    print(json.dumps(out))
    return out


def run_parity_grad(n, block, h=2e-3, out_path=None):
    """Large-n GRADIENT oracle (VERDICT r4 item 3): the streamed-engine
    REML value+grad on the real chip vs central finite differences of
    the independent NumPy streamed-oracle REML along the logsigma2,
    log-noise and one loginvrho direction.

    Each FD component is computed at steps h and h/2 with Richardson
    extrapolation (error ~h^4); |g_h - g_{h/2}| / 3 is reported as the
    FD's own convergence estimate so the comparison is honest about
    what the oracle can resolve.  Tolerance: the engine's measured
    class envelope -- 1e-4 relative per component (typical ~1e-5; the
    f32 Kinv-series + f32 kernel-chain contraction floor, measured at
    n=1536/8192 in round 5; parallel/streamed.py module docstring).
    The artifact carries the much tighter measured values.
    """
    set_chol_engine("mixed")
    import jax
    import gpmp_tpu.num as gnp
    from gpmp_tpu.parallel import make_mesh
    from gpmp_tpu.parallel.likelihood import (
        sharded_negative_log_restricted_likelihood,
    )

    xi, zi, _xt, covparam = make_data(n)
    model = _build_model()
    mesh = make_mesh(1, axis_name="shard")
    xi_d, zi_d = gnp.asarray(xi), gnp.asarray(zi)
    p0 = gnp.asarray(covparam)

    vg = jax.jit(jax.value_and_grad(
        lambda p: sharded_negative_log_restricted_likelihood(
            model, p, xi_d, zi_d, mesh, block=block)))
    t0 = time.perf_counter()
    v_dev, g_dev = vg(p0)
    v_dev = float(v_dev)
    g_dev = np.asarray(g_dev)
    print(f"[device] value+grad in {time.perf_counter()-t0:.1f}s "
          f"(incl. compile); value={v_dev:.6f} grad={g_dev}",
          file=sys.stderr, flush=True)

    # logsigma2's trace term tr(Kinv dK/dlogsigma2) cancels ~n/noise
    # against the quadratic term near the measured covparam, amplifying
    # the f32 Kinv-series noise with n: measured 6.9e-7 (n=8192) ->
    # 2.5e-4 (n=24576) on hardware; worst-case envelope 1e-3.  The
    # other components sit at ~1e-5 across n (envelope 1e-4).
    comps = [(0, "logsigma2", 1e-3), (1, "lognoise", 1e-4),
             (2, "loginvrho0", 1e-4)]

    def f(p):
        t0 = time.perf_counter()
        v, _, _ = oracle_reml_and_predict(xi, zi, None, p, verbose=False,
                                          value_only=True)
        print(f"[oracle] eval in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        return v

    v_np = f(covparam)
    results = []
    all_pass = True
    for idx, name, tol in comps:
        def fd(step):
            e = np.zeros_like(covparam)
            e[idx] = step
            return (f(covparam + e) - f(covparam - e)) / (2.0 * step)

        g_h, g_h2 = fd(h), fd(h / 2.0)
        g_rich = (4.0 * g_h2 - g_h) / 3.0
        fd_err = abs(g_h - g_h2) / 3.0
        scale = max(abs(g_rich), 1e-300)
        rel = abs(g_dev[idx] - g_rich) / scale
        # the comparison cannot certify below what the FD resolves
        eff_tol = max(tol, 2.0 * fd_err / scale)
        ok = rel <= eff_tol
        all_pass &= ok
        results.append({
            "component": name, "index": idx,
            "grad_device": float(g_dev[idx]), "grad_fd_oracle": float(g_rich),
            "rel_err": float(rel), "tol_envelope": tol,
            "fd_resolution_rel": float(fd_err / scale),
            "pass": bool(ok),
        })
        print(f"[grad] {name}: device={g_dev[idx]:.8g} "
              f"fd={g_rich:.8g} rel={rel:.3g} fd_res={fd_err/scale:.3g}",
              file=sys.stderr, flush=True)

    out = {
        "metric": "streamed_reml_grad_parity_n%d" % n,
        "n": n, "d": D, "engine": "mixed(streamed)", "fd_step": h,
        "reml_value_device": v_dev, "reml_value_oracle": v_np,
        "value_rel_err": abs(v_dev - v_np) / abs(v_np),
        "components": results,
        "pass": bool(all_pass),
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as fo:
            fo.write(line + "\n")
    return out


def run_oracle_check(n=1536, block=256):
    """Oracle vs the in-repo Model API at small n (oracle validation)."""
    import gpmp_tpu.num as gnp

    xi, zi, xt, covparam = make_data(n)
    model = _build_model()
    model.covparam = gnp.asarray(covparam)
    v_model = float(model.negative_log_restricted_likelihood(
        gnp.asarray(covparam), gnp.asarray(xi), gnp.asarray(zi)
    ))
    zpm_m, zpv_m = model.predict(xi, zi, xt)
    v_np, zpm_np, zpv_np = oracle_reml_and_predict(
        xi, zi, xt, covparam, verbose=False
    )
    out = {
        "metric": "oracle_self_check", "n": n,
        "reml_rel_err": abs(v_model - v_np) / abs(v_np),
        "predict_mean_rel_err": float(np.max(np.abs(
            np.asarray(zpm_m).ravel() - zpm_np)) / np.max(np.abs(zpm_np))),
        "predict_var_rel_err": float(np.max(np.abs(
            np.asarray(zpv_m).ravel() - zpv_np)) / np.max(np.abs(zpv_np))),
    }
    print(json.dumps(out))
    return out


def run_scale(n, block, engine):
    set_chol_engine(engine)
    import jax
    import gpmp_tpu.num as gnp
    from gpmp_tpu.parallel import make_mesh
    from gpmp_tpu.parallel.likelihood import (
        sharded_negative_log_restricted_likelihood,
    )

    xi, zi, xt, covparam = make_data(n)
    model = _build_model()
    mesh = make_mesh(1, axis_name="shard")
    xi_d, zi_d = gnp.asarray(xi), gnp.asarray(zi)
    p0 = gnp.asarray(covparam)

    val = jax.jit(lambda p: sharded_negative_log_restricted_likelihood(
        model, p, xi_d, zi_d, mesh, block=block))
    vg = jax.jit(jax.value_and_grad(
        lambda p: sharded_negative_log_restricted_likelihood(
            model, p, xi_d, zi_d, mesh, block=block)))

    t0 = time.perf_counter()
    v0 = float(val(p0))
    t_compile_v = time.perf_counter() - t0
    tv = []
    for i in range(3):
        t0 = time.perf_counter()
        float(val(p0 + 1e-4 * (i + 1)))      # host fetch forces execution
        tv.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    _v, g = vg(p0)
    g0 = np.asarray(g)
    t_compile_vg = time.perf_counter() - t0
    tg = []
    for i in range(3):
        t0 = time.perf_counter()
        _v, g = vg(p0 + 1e-4 * (i + 1))
        np.asarray(g)
        tg.append(time.perf_counter() - t0)

    out = {
        "metric": "sharded_reml_wallclock", "n": n, "d": D,
        "engine": engine, "block": block, "value": v0,
        "value_ms": round(min(tv) * 1e3, 1),
        "value_grad_ms": round(min(tg) * 1e3, 1),
        "compile_value_s": round(t_compile_v, 1),
        "compile_grad_s": round(t_compile_vg, 1),
    }
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["parity", "parity-grad",
                                       "oracle-check", "scale"],
                    default="oracle-check")
    ap.add_argument("--n", type=int, default=51200)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--engine", default="mixed")
    ap.add_argument("--device", choices=["cpu", "default"], default="cpu",
                    help="parity mode: cpu = virtual 8-device mesh; "
                    "default = the real chip (single-device mesh)")
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="parity-grad: also write the JSON line here")
    args = ap.parse_args()
    if args.mode == "parity":
        run_parity(args.n, args.block, n_devices=args.n_devices,
                   device=args.device,
                   engine=args.engine if args.device == "default" else None)
    elif args.mode == "parity-grad":
        run_parity_grad(args.n, args.block, out_path=args.out)
    elif args.mode == "oracle-check":
        run_oracle_check()
    else:
        run_scale(args.n, args.block, args.engine)


if __name__ == "__main__":
    main()
