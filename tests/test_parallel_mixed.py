# tests/test_parallel_mixed.py
"""Mixed-precision sharded solve+logdet engine (parallel/mixed.py) vs
f64 oracles on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.parallel import make_mesh
from gpmp_tpu.parallel.likelihood import (
    sharded_negative_log_restricted_likelihood,
)
from gpmp_tpu.parallel.mixed import sharded_mp_solve_and_logdet
from gpmp_tpu.config import get_chol_engine, set_chol_engine

N, BLOCK = 512, 64


def _spd(n, cond=1e4, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return Q @ np.diag(eigs) @ Q.T


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_name="shard")


def test_mp_solve_and_logdet_single_device():
    # 1-device mesh takes the no-shard_map specialization
    mesh1 = make_mesh(1, axis_name="shard")
    K = _spd(N, seed=7)
    rng = np.random.default_rng(8)
    B = rng.normal(size=(N, 2))
    X, ld = jax.jit(
        lambda K, B: sharded_mp_solve_and_logdet(K, B, mesh1, block=BLOCK)
    )(gnp.asarray(K), gnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(K, B),
                               rtol=1e-7, atol=1e-9)
    _s, ld_ref = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(ld), ld_ref, rtol=1e-9)


def test_mp_solve_and_logdet_matches_oracle(mesh):
    K = _spd(N, seed=1)
    rng = np.random.default_rng(2)
    B = rng.normal(size=(N, 4))
    X, ld = jax.jit(
        lambda K, B: sharded_mp_solve_and_logdet(K, B, mesh, block=BLOCK)
    )(gnp.asarray(K), gnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(K, B),
                               rtol=1e-7, atol=1e-9)
    _s, ld_ref = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(ld), ld_ref, rtol=1e-9)


def test_mp_logdet_robust_branch(mesh):
    # cond ~ 3e5 pushes |H|_F^2 past the series guard onto the
    # second-level branch; the identity must still hold to ~1e-8 rel
    # (absolute tolerance scaled to the logdet magnitude).
    K = _spd(N, cond=3e5, seed=3)
    b = np.ones(N)
    _X, ld = jax.jit(
        lambda K, b: sharded_mp_solve_and_logdet(K, b, mesh, block=BLOCK)
    )(gnp.asarray(K), gnp.asarray(b))
    _s, ld_ref = np.linalg.slogdet(K)
    assert abs(float(ld) - ld_ref) < 1e-6 * max(abs(ld_ref), 1.0)


def test_mp_gradient_matches_closed_form(mesh):
    # d/dt [logdet(K + tV) + 1^T (K + tV)^{-1} b] at t=0 has the exact
    # closed form tr(K^{-1} V) - 1^T K^{-1} V K^{-1} b (FD probes are
    # curvature-limited here and much less accurate than the VJP)
    K = _spd(N, cond=1e2, seed=4)
    rng = np.random.default_rng(5)
    b = rng.normal(size=N)
    V = rng.normal(size=(N, N))
    V = (V + V.T) / 2
    Kj, bj, Vj = gnp.asarray(K), gnp.asarray(b), gnp.asarray(V)

    def f(t):
        X, ld = sharded_mp_solve_and_logdet(Kj + t * Vj, bj, mesh,
                                            block=BLOCK)
        return ld + jnp.sum(X)

    g = float(jax.jit(jax.grad(f))(jnp.float64(0.0)))
    Kinv = np.linalg.inv(K)
    g_exact = np.trace(Kinv @ V) - np.ones(N) @ Kinv @ V @ (Kinv @ b)
    np.testing.assert_allclose(g, g_exact, rtol=1e-7)


def test_mp_non_pd_yields_nan(mesh):
    K = -np.eye(N)
    b = np.ones(N)
    X, ld = jax.jit(
        lambda K, b: sharded_mp_solve_and_logdet(K, b, mesh, block=BLOCK)
    )(gnp.asarray(K), gnp.asarray(b))
    assert not np.isfinite(float(ld))
    assert not np.all(np.isfinite(np.asarray(X)))


def test_sharded_reml_mixed_engine_matches_f64(mesh):
    rng = np.random.default_rng(42)
    xi = rng.uniform(size=(N, 3))
    zi = np.sin(3 * xi[:, 0]) + 0.5 * xi[:, 1] + 0.1 * rng.normal(size=N)

    def mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel(x, y, param, pairwise=False):
        sigma2 = gnp.exp(param[0])
        noise = gnp.exp(param[1])
        loginvrho = param[2:]
        if y is x or y is None:
            if pairwise:
                return (sigma2 + noise) * gnp.ones((x.shape[0],))
            K = gnp.scaled_distance(loginvrho, x, x)
            return sigma2 * gp.kernel.maternp_kernel(2, K) + noise * gnp.eye(
                K.shape[0]
            )
        K = gnp.scaled_distance(loginvrho, x, y)
        return sigma2 * gp.kernel.maternp_kernel(2, K)

    model = gp.Model(mean, kernel)
    p0 = gnp.asarray(
        np.concatenate([[np.log(np.var(zi))], [np.log(0.01)],
                        -np.log(np.std(xi, axis=0))])
    )
    xi, zi = gnp.asarray(xi), gnp.asarray(zi)

    def crit(p):
        return sharded_negative_log_restricted_likelihood(
            model, p, xi, zi, mesh, block=BLOCK
        )

    old = get_chol_engine()
    try:
        set_chol_engine("f64")
        v64, g64 = jax.jit(jax.value_and_grad(crit))(p0)
        set_chol_engine("mixed")
        vmp, gmp = jax.jit(jax.value_and_grad(crit))(p0)
    finally:
        set_chol_engine(old)

    np.testing.assert_allclose(float(vmp), float(v64), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gmp), np.asarray(g64),
                               rtol=1e-4, atol=1e-7)


def test_streamed_level2_sandwich_matches_dense():
    # The doubly-blocked streamed (tr G, |G|_F^2) must be bitwise-close
    # to the dense f64 sandwich it replaces on the single-device robust
    # branch (only engaged at n >= 12288 on a real chip, so exercise the
    # helper directly here at small n).
    from gpmp_tpu.parallel.mixed import _level2_chunk, _streamed_level2_g

    n = 256
    K = _spd(n, cond=1e7, seed=11)
    L32 = np.linalg.cholesky(K).astype(np.float32)
    M32 = np.linalg.inv(L32).astype(np.float32)
    R32 = (K - L32.astype(np.float64) @ L32.astype(np.float64).T).astype(
        np.float32
    )
    H = (M32 @ R32 @ M32.T).astype(np.float32)
    E32 = np.eye(n, dtype=np.float32) + H
    F32 = np.linalg.cholesky(E32).astype(np.float32)
    MF32 = np.linalg.inv(F32).astype(np.float32)

    E64 = np.eye(n) + H.astype(np.float64)
    MF64 = MF32.astype(np.float64)
    G = MF64 @ (E64 @ MF64.T) - np.eye(n)
    g1_dense, g2_dense = np.trace(G), np.sum(G * G)

    for chunk in (_level2_chunk(n), 32, n):
        g1, g2 = jax.jit(_streamed_level2_g, static_argnums=2)(
            jnp.asarray(H), jnp.asarray(MF32), chunk
        )
        np.testing.assert_allclose(float(g1), g1_dense, rtol=1e-12,
                                   atol=1e-14)
        np.testing.assert_allclose(float(g2), g2_dense, rtol=1e-12,
                                   atol=1e-14)


def test_level2_chunk_divides_and_bounds():
    from gpmp_tpu.parallel.mixed import _level2_chunk, _LEVEL2_CHUNK_FLOOR

    for n in (256, 4096, 12288, 16384, 24576, 32768):
        c = _level2_chunk(n)
        assert n % c == 0
        if n >= 12288:
            assert n * c * 32 <= (1 << 29)  # hoisted temp <= 0.5 GB
    # divisor search: n with large odd factors still gets a usable chunk
    # (ADVICE r2: the old n//8-halving search collapsed 12296 to 1)
    assert _level2_chunk(12296) >= _LEVEL2_CHUNK_FLOOR
    # primes get chunk 1 -> caller takes the dense sandwich branch
    assert _level2_chunk(12289) == 1


def test_chunked_gram_pullback_matches_vjp():
    # The row-chunked f32 gram pullback (used single-device at n >= 8192
    # to bound backward residuals) must match the whole-gram jax.vjp up
    # to f32 summation-order noise.
    from gpmp_tpu.parallel.likelihood import (
        _chunked_gram_pullback,
        sharded_covariance,
    )

    n, d = 256, 3
    rng = np.random.default_rng(3)
    xi32 = jnp.asarray(rng.uniform(size=(n, d)), dtype=jnp.float32)
    p32 = jnp.asarray(
        np.concatenate([[0.1], [-4.0], -np.log([0.3, 0.4, 0.5])]),
        dtype=jnp.float32,
    )
    Kbar32 = jnp.asarray(rng.normal(size=(n, n)), dtype=jnp.float32)

    def noisy_kernel(x, y, covparam, pairwise=False):
        # reference convention: the noise diagonal rides the `y is x`
        # self branch only (cross calls return the prior covariance)
        sigma2 = gnp.exp(covparam[0])
        noise = gnp.exp(covparam[1])
        if pairwise:
            return (sigma2 + noise) * gnp.ones((x.shape[0],))
        self_branch = y is x or y is None
        yy = x if self_branch else y
        K = gnp.scaled_distance(covparam[2:], x, yy)
        K = sigma2 * gp.kernel.maternp_kernel(2, K)
        if self_branch:
            K = K + noise * gnp.eye(x.shape[0], dtype=K.dtype)
        return K

    model = gp.Model(None, noisy_kernel, meantype="zero")

    def cov32(p):
        return sharded_covariance(model, p, xi32, None)

    _K, vjp = jax.vjp(cov32, p32)
    (pbar_ref,) = vjp(Kbar32)
    pbar = _chunked_gram_pullback(model, p32, xi32, Kbar32, 32)
    np.testing.assert_allclose(np.asarray(pbar), np.asarray(pbar_ref),
                               rtol=2e-5, atol=2e-4)
