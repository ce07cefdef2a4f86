# tests/test_ops.py
"""Mixed-precision engine tests.

The refinement/logdet math (f32 XLA factorizations + f64 matmul
corrections) is validated against f64 oracles on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpmp_tpu.num as gnp
from gpmp_tpu.config import get_chol_engine, set_chol_engine
from gpmp_tpu.ops.mixed import (
    mp_logdet,
    mp_solve_and_logdet,
    refined_cholesky_solve,
)


def _spd(n, cond=1e4, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return Q @ np.diag(eigs) @ Q.T


@pytest.mark.parametrize("cond,tol", [(1e2, 1e-11), (1e4, 1e-9), (1e6, 1e-4)])
def test_refined_solve_accuracy(cond, tol):
    n = 300
    K = _spd(n, cond=cond, seed=2)
    rng = np.random.default_rng(3)
    B = rng.normal(size=(n, 3))
    Kj = gnp.asarray(K)
    X, _ = refined_cholesky_solve(Kj, gnp.asarray(B), n_refine=6)
    X_ref = np.linalg.solve(K, B)
    rel = np.max(np.abs(np.asarray(X) - X_ref)) / np.max(np.abs(X_ref))
    assert rel < tol


@pytest.mark.parametrize("cond,tol", [(1e2, 1e-10), (1e4, 1e-9), (1e6, 1e-6)])
def test_mp_logdet_accuracy(cond, tol):
    n = 300
    K = _spd(n, cond=cond, seed=4)
    Kj = gnp.asarray(K)
    _, ld = mp_solve_and_logdet(Kj, gnp.asarray(np.ones(n)))
    _s, ld_ref = np.linalg.slogdet(K)
    assert abs(float(ld) - ld_ref) / max(abs(ld_ref), 1.0) < tol


def test_mp_engine_differentiable():
    n = 64
    K0 = _spd(n, cond=1e3, seed=5)
    z = np.random.default_rng(6).normal(size=n)

    def nll(theta):
        K = gnp.asarray(K0) * jnp.exp(theta)
        x, ld = mp_solve_and_logdet(K, gnp.asarray(z))
        return 0.5 * (ld + z @ x)

    g = jax.grad(nll)(jnp.asarray(0.1))
    # FD check
    h = 1e-5
    fd = (float(nll(jnp.asarray(0.1 + h))) - float(nll(jnp.asarray(0.1 - h)))) / (
        2 * h
    )
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_nonpd_propagates_nan():
    n = 64
    K = -np.eye(n)
    x, ld = mp_solve_and_logdet(gnp.asarray(K), gnp.asarray(np.ones(n)))
    assert np.isnan(float(ld)) or np.isinf(float(ld))


@pytest.mark.parametrize("cond,steps,tol", [(1e2, 2, 1e-13), (1e4, 2, 1e-11),
                                            (1e6, 3, 1e-8)])
def test_refined_cholesky_accuracy(cond, steps, tol):
    from gpmp_tpu.ops.refine import refined_cholesky

    n = 300
    K = _spd(n, cond=cond, seed=7)
    L = np.asarray(refined_cholesky(gnp.asarray(K), steps=steps))
    L_ref = np.linalg.cholesky(K)
    rel = np.abs(L - L_ref).max() / np.abs(L_ref).max()
    assert rel < tol


def test_refined_cholesky_nonpd_nan():
    from gpmp_tpu.ops.refine import refined_cholesky

    L = refined_cholesky(gnp.asarray(-np.eye(64)))
    assert np.isnan(np.asarray(L)).any()


@pytest.mark.parametrize("cond", [1e3, 1e6])
def test_mp_engine_custom_vjp_grad(cond):
    """Analytic VJP vs f64 autodiff oracle on both lax.cond branches.

    cond=1e3 exercises the single-level series branch, cond=1e6 the
    two-level robust branch (|D|_F^2 > tau for the f32 preconditioner).
    """
    n = 200
    K0 = _spd(n, cond=cond, seed=8)
    z = np.random.default_rng(9).normal(size=n)
    K0j, zj = gnp.asarray(K0), gnp.asarray(z)

    def nll_mixed(theta):
        K = K0j * jnp.exp(theta[0]) + jnp.exp(theta[1]) * jnp.eye(n) * 1e-9
        x, ld = mp_solve_and_logdet(K, zj)
        return 0.5 * (ld + zj @ x)

    def nll_f64(theta):
        K = K0j * jnp.exp(theta[0]) + jnp.exp(theta[1]) * jnp.eye(n) * 1e-9
        C = jnp.linalg.cholesky(K)
        x = jax.scipy.linalg.cho_solve((C, True), zj)
        return 0.5 * (2 * jnp.sum(jnp.log(jnp.diag(C))) + zj @ x)

    theta = jnp.asarray(np.array([0.07, -0.3]))
    v_m, g_m = jax.value_and_grad(nll_mixed)(theta)
    v_f, g_f = jax.value_and_grad(nll_f64)(theta)
    # at cond=1e6 the refined solve (and any f64 solve) carries an
    # inherent O(eps * cond) relative error in the quadratic form
    vtol = 1e-8 if cond < 1e4 else 1e-5
    gtol = 1e-8 if cond < 1e4 else 1e-4
    np.testing.assert_allclose(float(v_m), float(v_f), rtol=vtol)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_f), rtol=gtol)


def test_mp_engine_custom_vjp_solve_cotangent():
    """Bbar and the -S X^T term: grad w.r.t. a parameter entering B."""
    n = 96
    K0 = _spd(n, cond=1e3, seed=10)
    z = np.random.default_rng(11).normal(size=n)
    K0j, zj = gnp.asarray(K0), gnp.asarray(z)

    def quad(theta):
        b = zj * theta
        x, _ld = mp_solve_and_logdet(K0j * jnp.exp(theta), b)
        return b @ x

    g = float(jax.grad(quad)(jnp.asarray(0.2)))
    h = 1e-6
    fd = (float(quad(jnp.asarray(0.2 + h))) - float(quad(jnp.asarray(0.2 - h)))) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-6)


@pytest.mark.parametrize("n,cond", [(300, 1e2), (500, 1e4), (400, 1e6)])
def test_sampling_sqrt(n, cond):
    """C C^T ~= K for the 4-matmul sampling factor; NaN on non-PD."""
    from gpmp_tpu.ops.refine import sampling_sqrt

    K = gnp.asarray(_spd(n, cond=cond, seed=int(np.log10(cond))))
    C = sampling_sqrt(K)
    rel = float(jnp.linalg.norm(C @ C.T - K) / jnp.linalg.norm(K))
    assert rel < 1e-8
    Cbad = sampling_sqrt(gnp.asarray(-np.eye(64)))
    assert bool(jnp.any(jnp.isnan(Cbad)))


def test_mp_engine_under_vmap():
    """Sampler pattern: vmap(value_and_grad(criterion)) over chains with
    the mixed engine's lax.cond + custom VJP inside."""
    import os

    import gpmp_tpu as gp

    n, d, p = 224, 2, 2  # above the mixed-engine size gate (192)
    rng = np.random.default_rng(0)
    xi_np = rng.uniform(size=(n, d))
    zi_np = np.sin(3 * xi_np[:, 0]) + 0.1 * rng.normal(size=n)

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, param, pairwise=False):
        s2 = gnp.exp(param[0])
        li = param[2:]
        if y is x or y is None:
            nv = gnp.exp(param[1])
            if pairwise:
                return s2 * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(li, x, x)
            return s2 * gp.kernel.maternp_kernel(p, K) + nv * gnp.eye(
                K.shape[0]
            )
        K = gnp.scaled_distance(li, x, y)
        return s2 * gp.kernel.maternp_kernel(p, K)

    model = gp.Model(constant_mean, kernel)
    xi, zi = gnp.asarray(xi_np), gnp.asarray(zi_np)
    f = lambda pp: model.negative_log_restricted_likelihood(pp, xi, zi)
    P0 = jnp.stack(
        [jnp.asarray([0.0, -4.0, 0.5, 0.3]) + 0.01 * i for i in range(3)]
    )
    prev = get_chol_engine()
    try:
        set_chol_engine("mixed")
        V, G = jax.jit(jax.vmap(jax.value_and_grad(f)))(P0)
        V_serial = [float(jax.value_and_grad(f)(P0[i])[0]) for i in range(3)]
    finally:
        set_chol_engine(prev)
    np.testing.assert_allclose(np.asarray(V), V_serial, rtol=1e-12)


def test_mixed_engine_forward_mode_fallback():
    """jax.hessian / jacfwd through the engine dispatchers must not
    raise under GPMP_CHOL_ENGINE=mixed: the dispatchers catch the
    custom_vjp trace-time TypeError and retry on the custom_jvp twin
    (ops/mixed.py mp_solve_and_logdet_fwdmode), so second-order
    autodiff runs ON the mixed engine -- the Hessian therefore matches
    the f64 engine to the engine's accuracy (~1e-7 relative), not
    bitwise, while reverse mode keeps the fast custom-VJP path."""
    import os

    from gpmp_tpu.core.linalg import solve_and_logdet

    n = 224  # above the mixed-engine size gate (192)
    rng = np.random.default_rng(3)
    A = rng.normal(size=(n, n))
    K0 = jnp.asarray(A @ A.T / n + np.eye(n))
    b = jnp.asarray(rng.normal(size=n))

    def crit(theta):
        K = jnp.exp(theta[0]) * K0 + jnp.exp(theta[1]) * jnp.eye(n)
        x, ld = solve_and_logdet(K, b)
        return 0.5 * (ld + b @ x)

    t0 = jnp.asarray([0.1, -2.0])

    prev = get_chol_engine()
    try:
        set_chol_engine("mixed")
        H_mixed = jax.hessian(crit)(t0)          # would raise before
        Jfwd = jax.jacfwd(jax.grad(crit))(t0)    # fwd-over-rev
        g_mixed = jax.grad(crit)(t0)             # fast path
    finally:
        set_chol_engine(prev)

    set_chol_engine("f64")
    try:
        H_f64 = jax.hessian(crit)(t0)
        g_f64 = jax.grad(crit)(t0)
    finally:
        set_chol_engine(prev)

    scale = np.max(np.abs(np.asarray(H_f64)))
    np.testing.assert_allclose(np.asarray(H_mixed), np.asarray(H_f64),
                               rtol=1e-6, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(Jfwd), np.asarray(H_f64),
                               rtol=1e-6, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(g_mixed), np.asarray(g_f64),
                               rtol=1e-8, atol=1e-10)


def test_mixed_engine_hessian_through_model_criterion():
    """End-to-end second-order check (VERDICT r2 item 6 "Done" bar):
    jax.hessian of the REML criterion through Model + the engine
    dispatchers works under GPMP_CHOL_ENGINE=mixed without the old
    tracer-introspection hack, and agrees with the f64 engine."""
    import os

    import gpmp_tpu as gp

    N, D = 256, 2
    rng = np.random.default_rng(0)
    xi_np = rng.uniform(size=(N, D))
    xi = gnp.asarray(xi_np)
    zi = gnp.asarray(np.sin(3 * xi_np[:, 0]) + 0.1 * rng.normal(size=N))

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, param, pairwise=False):
        sigma2 = gnp.exp(param[0])
        loginvrho = param[2:]
        if y is x or y is None:
            noise = gnp.exp(param[1])
            if pairwise:
                return sigma2 * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(loginvrho, x, x)
            return sigma2 * gp.kernel.maternp_kernel(2, K) + (
                noise * gnp.eye(K.shape[0])
            )
        Kd = (gnp.scaled_distance_elementwise if pairwise
              else gnp.scaled_distance)(loginvrho, x, y)
        return sigma2 * gp.kernel.maternp_kernel(2, Kd)

    model = gp.Model(constant_mean, kernel)
    p0 = gnp.asarray(np.array([0.0, np.log(1e-2), np.log(2.0), np.log(2.0)]))

    def f(p):
        return model.negative_log_restricted_likelihood(p, xi, zi)

    prev = get_chol_engine()
    try:
        set_chol_engine("mixed")
        H_mixed = np.asarray(jax.hessian(f)(p0))
        g_fwd = np.asarray(jax.jacfwd(f)(p0))
        g_rev = np.asarray(jax.grad(f)(p0))
        FI = np.asarray(model.fisher_information_torch(xi, p0))
        set_chol_engine("f64")
        H_f64 = np.asarray(jax.hessian(f)(p0))
    finally:
        set_chol_engine(prev)

    assert np.isfinite(H_mixed).all()
    assert np.isfinite(FI).all()
    scale = np.max(np.abs(H_f64))
    assert np.max(np.abs(H_mixed - H_f64)) / scale < 1e-6
    np.testing.assert_allclose(g_fwd, g_rev, rtol=1e-8, atol=1e-9)


def test_engine_flip_between_jits_honored(monkeypatch):
    """Engine dispatch reads get_config().chol_engine at trace time
    (VERDICT r4 item 6): flipping the engine between two jax.jit
    wrappings of the same user function must be honored by each trace --
    no stale env/config value baked into user-jitted captures."""
    import gpmp_tpu.core.linalg as clin
    import gpmp_tpu.ops.mixed as opsmixed

    n = 256
    K = gnp.asarray(_spd(n, cond=1e3, seed=5))
    rhs = gnp.asarray(np.random.default_rng(0).normal(size=(n, 1)))

    def user_fn(K, rhs):
        return clin.solve_and_logdet(K, rhs)[1]

    calls = []
    real = opsmixed.mp_solve_and_logdet
    monkeypatch.setattr(
        opsmixed, "mp_solve_and_logdet",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1],
    )

    prev = get_chol_engine()
    try:
        set_chol_engine("f64")
        v64 = float(jax.jit(user_fn)(K, rhs))
        assert not calls, "f64 engine must not touch the mixed path"
        set_chol_engine("mixed")
        vmp = float(jax.jit(user_fn)(K, rhs))
        assert calls, "mixed engine must engage on the second trace"
    finally:
        set_chol_engine(prev)
    assert abs(vmp - v64) <= 1e-8 * abs(v64)
