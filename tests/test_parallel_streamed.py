# tests/test_parallel_streamed.py
"""Streamed single-chip mixed engine (parallel/streamed.py) vs f64
oracles.  Small n with forced modes: the streaming structure (panelled
residual, chunked traces, fused pullback) is size-independent; the
memory claims are exercised on the real chip by bench_large_n."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.parallel import make_mesh
from gpmp_tpu.parallel.likelihood import (
    sharded_covariance,
    sharded_negative_log_restricted_likelihood,
)
from gpmp_tpu.parallel.streamed import (
    choose_mode,
    kernel_is_f32_polymorphic,
    make_streamed_sal,
    streamed_mp_solve_and_logdet,
)

N, D = 512, 3


def _mean(x, param):
    return gnp.ones((x.shape[0], 1))


def _kernel(x, y, param, pairwise=False):
    sigma2 = gnp.exp(param[0])
    noise = gnp.exp(param[1])
    loginvrho = param[2:]
    if y is x or y is None:
        if pairwise:
            return (sigma2 + noise) * gnp.ones((x.shape[0],))
        Dm = gnp.scaled_distance(loginvrho, x, x)
        return sigma2 * gp.kernel.maternp_kernel(2, Dm) + (
            noise * gnp.eye(Dm.shape[0])
        )
    Dm = (gnp.scaled_distance_elementwise if pairwise
          else gnp.scaled_distance)(loginvrho, x, y)
    return sigma2 * gp.kernel.maternp_kernel(2, Dm)


@pytest.fixture(scope="module")
def problem():
    model = gp.Model(_mean, _kernel)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.uniform(size=(N, D)))
    zi = jnp.asarray(np.sin(3 * np.asarray(xi)[:, 0])
                     + 0.1 * rng.normal(size=N))
    p0 = jnp.asarray(np.array([0.0, np.log(1e-2), 0.3, 0.2, 0.1]))
    B = jnp.asarray(rng.normal(size=(N, 2)))
    K = np.asarray(sharded_covariance(model, p0, xi, None))
    return model, xi, zi, p0, B, K


@pytest.mark.parametrize("mode", ["ff", "recompute"])
def test_streamed_solve_and_logdet_matches_oracle(problem, mode):
    model, xi, _zi, p0, B, K = problem
    X, ld = jax.jit(
        lambda p, B: streamed_mp_solve_and_logdet(model, p, xi, B,
                                                  mode=mode)
    )(p0, B)
    Xref = np.linalg.solve(K, np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), Xref, rtol=1e-7, atol=1e-10)
    _s, ld_ref = np.linalg.slogdet(K)
    # ff carries the eps32^2 two-float representation error; recompute
    # reads exact f64 kernel values
    tol = 1e-11 if mode == "ff" else 1e-12
    assert abs(float(ld) - ld_ref) <= tol * abs(ld_ref) * N


@pytest.mark.parametrize("mode", ["ff", "recompute"])
def test_streamed_gradient_matches_exact_autodiff(problem, mode):
    model, xi, _zi, p0, B, _K = problem

    def f_exact(p):
        K = sharded_covariance(model, p, xi, None)
        C = jnp.linalg.cholesky(K)
        ld = 2.0 * jnp.sum(jnp.log(jnp.diag(C)))
        X = jax.scipy.linalg.cho_solve((C, True), B)
        return ld + jnp.sum(X)

    def f_streamed(p):
        X, ld = streamed_mp_solve_and_logdet(model, p, xi, B, mode=mode)
        return ld + jnp.sum(X)

    g_exact = np.asarray(jax.grad(f_exact)(p0))
    g = np.asarray(jax.jit(jax.grad(f_streamed))(p0))
    # all-f32 analytic VJP.  The trace-heavy log-sigma2 component is a
    # cancellation-amplified contraction (|Kinv| entries reach 1/noise,
    # the net trace is n), so f32 per-product rounding leaves ~1e-4
    # relative there -- measured at the same level on the RESIDENT
    # mixed engine (1.0e-4 on this problem, 7e-5 even with an exact
    # f64 gram backward); the other components sit at ~1e-6.  This is
    # the mixed-engine class envelope, ample for the optimizer.
    np.testing.assert_allclose(g, g_exact,
                               rtol=1e-3, atol=1e-6 * np.abs(g_exact).max())


@pytest.mark.parametrize("mode", ["ff", "recompute"])
def test_streamed_b_cotangent(problem, mode):
    """Bbar = K^{-1} Xbar: gradient w.r.t. the rhs must be exact."""
    model, xi, _zi, p0, B, K = problem
    w = jnp.asarray(np.random.default_rng(3).normal(size=(N, 2)))

    def f(Bv):
        X, _ld = streamed_mp_solve_and_logdet(model, p0, xi, Bv,
                                              mode=mode)
        return jnp.sum(w * X)

    g = np.asarray(jax.grad(f)(B))
    g_exact = np.linalg.solve(K, np.asarray(w))
    np.testing.assert_allclose(g, g_exact, rtol=1e-7, atol=1e-10)


def test_streamed_non_pd_yields_nan(problem):
    model, xi, _zi, p0, B, _K = problem
    # negative "variance" makes the f32 Cholesky fail -> NaN
    p_bad = p0.at[0].set(jnp.nan)
    X, ld = streamed_mp_solve_and_logdet(model, p_bad, xi, B, mode="ff")
    assert not np.isfinite(float(ld))


def test_streamed_reml_dispatch_matches_default(problem, monkeypatch):
    """With GPMP_STREAM_N lowered, the sharded REML criterion routes
    through the streamed engine and must agree with the default path
    (value AND gradient)."""
    import gpmp_tpu.parallel.streamed as streamed_mod

    model, xi, zi, p0, _B, _K = problem
    mesh1 = make_mesh(1, axis_name="shard")

    def crit(p):
        return sharded_negative_log_restricted_likelihood(
            model, p, xi, zi, mesh1, block=128
        )

    v_def, g_def = jax.value_and_grad(crit)(p0)

    import gpmp_tpu.config as gconfig
    monkeypatch.setattr(streamed_mod, "STREAM_MIN_N", 256)
    prev = gconfig.get_chol_engine()
    gconfig.set_chol_engine("mixed")
    try:
        v_st, g_st = jax.value_and_grad(crit)(p0)
    finally:
        gconfig.set_chol_engine(prev)
    assert abs(float(v_st) - float(v_def)) <= 1e-8 * abs(float(v_def))
    # gradient envelope: see test_streamed_gradient_matches_exact_autodiff
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_def),
                               rtol=1e-3, atol=1e-6)


def test_streamed_robust_branch_ill_conditioned():
    """Small noise drives cond(K) past the series guard; the robust
    branch must still deliver ~1e-8 logdet."""
    model = gp.Model(_mean, _kernel)
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.uniform(size=(N, D)))
    B = jnp.asarray(rng.normal(size=N))
    p_ill = jnp.asarray(np.array([0.0, np.log(3e-7), 1.0, 1.0, 1.0]))
    K = np.asarray(sharded_covariance(model, p_ill, xi, None))
    _s, ld_ref = np.linalg.slogdet(K)
    X, ld = streamed_mp_solve_and_logdet(model, p_ill, xi, B, mode="ff",
                                         robust=True)
    assert abs(float(ld) - ld_ref) < 1e-6 * max(abs(ld_ref), 1.0)
    # robust disabled -> the same point must yield NaN, never a silent
    # series value
    _X2, ld2 = streamed_mp_solve_and_logdet(model, p_ill, xi, B,
                                            mode="ff", robust=False)
    assert (not np.isfinite(float(ld2))) or (
        abs(float(ld2) - ld_ref) < 1e-6 * max(abs(ld_ref), 1.0)
    )


def test_choose_mode_and_poly_probe(problem):
    model, xi, _zi, p0, _B, _K = problem
    cap_v5e = int(15.75 * (1 << 30) * 0.85)   # one v5e chip
    cap_big = 64 * (1 << 30)
    assert choose_mode(20480, cap_big) == "ff"
    # on a v5e, n=24576 must select the lean recompute mode (the ff
    # value program measured 21.9 GB incl. fragmentation -- round 4)
    assert choose_mode(24576, cap_v5e) == "recompute"
    assert choose_mode(65536, cap_v5e) is None
    assert kernel_is_f32_polymorphic(model, p0, xi)

    def f64_kernel(x, y, param, pairwise=False):
        base = _kernel(x, y, param, pairwise)
        return base + jnp.zeros(base.shape, jnp.float64)

    model64 = gp.Model(_mean, f64_kernel)
    assert not kernel_is_f32_polymorphic(model64, p0, xi)


def test_dispatch_memory_model_v5e():
    """Pin the calibrated memory model at the v5e cap (ADVICE r4: the
    fixed n=20480 cutover left 16384<n<20480 routed to a resident
    compile that OOMs).  cap = 0.85 * 16 GiB (the _device_bytes_cap
    fallback for a 16 GB chip)."""
    import gpmp_tpu.parallel.streamed as streamed_mod

    cap = int(0.85 * 16 * 1024 ** 3)
    # resident engine: fits at its measured max, not past it
    assert streamed_mod._resident_fits(16384, cap_bytes=cap)
    assert not streamed_mod._resident_fits(20480, cap_bytes=cap)
    # streamed recompute: covers everything the resident cannot reach,
    # up to the measured single-chip ceiling (28672); 32768 is
    # measured-impossible (16.15 GB > 15.75 GB, round-5 dump)
    assert streamed_mod.choose_mode(20480, cap_bytes=cap) is not None
    assert streamed_mod.choose_mode(24576, cap_bytes=cap) == "recompute"
    assert streamed_mod.choose_mode(28672, cap_bytes=cap) == "recompute"
    assert streamed_mod.choose_mode(32768, cap_bytes=cap) is None
    # no dispatch gap up to the measured single-chip ceiling: every n
    # (512-divisible) either fits the resident engine or has a
    # streamed mode; past the ceiling choose_mode correctly refuses
    # (None -> "use a multi-device mesh"), never a resident route that
    # would OOM at compile
    for n in range(4096, 28672 + 1, 512):
        assert (streamed_mod._resident_fits(n, cap_bytes=cap)
                or streamed_mod.choose_mode(n, cap_bytes=cap) is not None), n
    for n in range(29696, 40960, 512):
        assert not streamed_mod._resident_fits(n, cap_bytes=cap), n
