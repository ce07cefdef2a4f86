# tests/test_parallel_scaling.py
"""Scaling-efficiency properties of the distributed layer (VERDICT r2
item 4).  The reference has no distributed layer (SURVEY section 2.7);
these tests pin the two properties that justify this one's existence:

1. per-device memory strictly drops as the mesh grows at fixed n
   (the point of sharding K: n is bounded by aggregate HBM), checked
   from XLA's own compiled memory statistics;
2. the factorization's communication stays at panel size -- no
   K-sized collective ever (chol.py's "2 n^2 total values" claim:
   two (n, block) panel gathers per panel step, n/block steps),
   checked against the compiled HLO's collective shapes.

Wall-clock scaling curves live in BENCHMARKS.md ("Distributed-layer
scaling evidence"); a 1-core host cannot show speedup, so the curves
there record per-device memory and communication volume, which are
hardware-independent.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpmp_tpu.parallel import make_mesh
from gpmp_tpu.parallel.chol import sharded_cholesky
from gpmp_tpu.parallel.likelihood import (
    sharded_negative_log_restricted_likelihood,
)

N = 1024
BLOCK = 128


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T / n + np.eye(n))


def _compile_chol(n_devices, K):
    mesh = make_mesh(n_devices, axis_name="shard")
    f = jax.jit(
        lambda K_: sharded_cholesky(K_, mesh, axis_name="shard", block=BLOCK)
    )
    return f.lower(K).compile()


def test_per_device_memory_drops_with_mesh_size():
    """argument + temp bytes per device must drop monotonically from
    1 -> 2 -> 4 -> 8 devices at fixed n (row-sharded K and row-sharded
    intermediates)."""
    K = _spd(N)
    per_device = []
    for nd in (1, 2, 4, 8):
        stats = _compile_chol(nd, K).memory_analysis()
        if stats is None:
            pytest.skip("memory_analysis unavailable on this backend")
        per_device.append(
            stats.argument_size_in_bytes + stats.temp_size_in_bytes
        )
    assert all(b > a for a, b in zip(per_device[1:], per_device[:-1])), (
        per_device
    )
    # the dominant (n, n) argument shards perfectly: 8-device argument
    # bytes = 1/8 of single-device
    stats1 = _compile_chol(1, K).memory_analysis()
    stats8 = _compile_chol(8, K).memory_analysis()
    assert stats8.argument_size_in_bytes * 8 == stats1.argument_size_in_bytes


def _collective_payload_bytes(hlo_text):
    """Largest payload (bytes) of any collective instruction in the HLO."""
    sizes = []
    pat = re.compile(
        r"([a-z0-9]+)\[([\d,]*)\][^=\n]*"
        r"(?:all-reduce|all-gather|collective-permute|reduce-scatter)\("
    )
    for dtype, dims in pat.findall(hlo_text):
        itemsize = int(re.search(r"\d+", dtype).group()) // 8 or 1
        numel = 1
        for d in dims.split(","):
            if d:
                numel *= int(d)
        sizes.append(numel * itemsize)
    return sizes


def test_no_K_sized_collective_in_factorization():
    """chol.py's design claim: total communication 2 n^2 values = two
    (n, block) panel gathers per step x n/block steps.  Statically: the
    compiled HLO must contain collectives of at most panel size (with
    the f64 emulation's (hi, lo) split, 2x panel bytes) -- never an
    (n, n) slab -- and their total payload must stay at the 2 n^2
    design bound.  (The unrolled factorization materializes the two
    gathers of every panel in the HLO; the fori_loop form has one loop
    body executed n/block times -- both are covered by the per-op and
    total bounds.)"""
    K = _spd(N)
    hlo = _compile_chol(8, K).as_text()
    sizes = _collective_payload_bytes(hlo)
    assert sizes, "expected panel-gather collectives in the sharded HLO"
    panel_bytes = N * BLOCK * 8
    assert max(sizes) <= 2 * panel_bytes, (max(sizes), panel_bytes)
    nb = N // BLOCK
    total_bound = 2 * nb * 2 * panel_bytes  # 2 gathers/panel, 2x slack
    assert sum(sizes) <= total_bound, (sum(sizes), total_bound)


def test_sharded_reml_memory_drops_with_mesh_size():
    """Same monotone per-device memory property for the full REML
    criterion value+grad program (gram + factorization + solves +
    backward)."""
    import gpmp_tpu as gp
    import gpmp_tpu.num as gnp

    n, d = 1024, 2
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.uniform(size=(n, d)))
    zi = jnp.sin(3.0 * xi[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))

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
            return sigma2 * gp.kernel.maternp_kernel(2, Dm) + (
                noise * gnp.eye(Dm.shape[0])
            )
        Dm = (gnp.scaled_distance_elementwise if pairwise
              else gnp.scaled_distance)(loginvrho, x, y)
        return sigma2 * gp.kernel.maternp_kernel(2, Dm)

    model = gp.Model(mean, kernel)
    p0 = jnp.asarray(np.array([0.0, np.log(1e-2), 0.3, 0.3]))

    per_device = []
    for nd in (1, 4, 8):
        mesh = make_mesh(nd, axis_name="shard")
        vg = jax.jit(jax.value_and_grad(
            lambda p: sharded_negative_log_restricted_likelihood(
                model, p, xi, zi, mesh, axis_name="shard", block=BLOCK
            )
        ))
        stats = vg.lower(p0).compile().memory_analysis()
        if stats is None:
            pytest.skip("memory_analysis unavailable on this backend")
        per_device.append(
            stats.argument_size_in_bytes + stats.temp_size_in_bytes
        )
    assert all(b > a for a, b in zip(per_device[1:], per_device[:-1])), (
        per_device
    )
