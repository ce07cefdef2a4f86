# tests/test_checkpoint.py
"""Sampler checkpoint/resume (no reference counterpart -- the reference
has no checkpointing anywhere, SURVEY.md section 5).

The resume test is EXACT: a run interrupted at a block boundary and
resumed from its checkpoint must reproduce the uninterrupted run's
traces bit-for-bit (state includes the PRNG key and all adaptation
state)."""

import numpy as np
import pytest

import gpmp_tpu.mcmc.mh as mh_mod
from gpmp_tpu.mcmc import MetropolisHastings, MHOptions
from gpmp_tpu.mcmc.checkpoint import (
    load_sampler_checkpoint,
    save_sampler_checkpoint,
)


def _log_target(x):
    return -0.5 * ((x[0] + 1.0) ** 2 / 0.5 + (x[1] - 2.0) ** 2 / 2.0)


def _options(tmp_path=None, every=1):
    kw = dict(
        dim=2, n_chains=2, seed=123, adaptation_interval=20,
        init_msg=None, show_global_progress=False,
    )
    if tmp_path is not None:
        kw.update(checkpoint_path=str(tmp_path / "mh.npz"),
                  checkpoint_every=every)
    return MHOptions(**kw)


def test_checkpoint_roundtrip(tmp_path):
    path = tmp_path / "raw.npz"
    arrays = {"a": np.arange(6.0).reshape(2, 3), "b": np.uint32([1, 2])}
    meta = {"kind": "test", "n": 5, "mode": "x"}
    save_sampler_checkpoint(path, arrays, meta)
    arrays2, meta2 = load_sampler_checkpoint(path)
    np.testing.assert_array_equal(arrays2["a"], arrays["a"])
    np.testing.assert_array_equal(arrays2["b"], arrays["b"])
    assert meta2["kind"] == "test" and meta2["n"] == 5


def test_mh_resume_is_exact(tmp_path):
    x0 = np.zeros(2)
    n_total, burnin = 300, 120

    # uninterrupted reference run
    mh_ref = MetropolisHastings(_log_target, options=_options())
    out_ref = np.asarray(mh_ref.scheduler(x0, n_total, burnin))

    # checkpointed run: stash every block checkpoint separately
    mh_a = MetropolisHastings(_log_target, options=_options(tmp_path))
    stashed = []
    orig_save = mh_a.save_checkpoint

    def stashing_save(path):
        p = tmp_path / f"block_{len(stashed)}.npz"
        orig_save(str(p))
        stashed.append(p)

    mh_a.save_checkpoint = stashing_save
    out_a = np.asarray(mh_a.scheduler(x0, n_total, burnin))
    np.testing.assert_array_equal(out_a, out_ref)
    assert len(stashed) >= 4

    # resume from a mid-run checkpoint ("crash" after some blocks)
    mid = stashed[len(stashed) // 2]
    mh_b = MetropolisHastings(_log_target, options=_options())
    mh_b.restore_checkpoint(str(mid))
    assert 0 < mh_b.global_iter < n_total
    out_b = np.asarray(mh_b.continue_run())
    np.testing.assert_array_equal(out_b, out_ref)


def test_mh_restore_shape_mismatch(tmp_path):
    mh_a = MetropolisHastings(_log_target, options=_options())
    mh_a.scheduler(np.zeros(2), 60, 20)
    p = tmp_path / "state.npz"
    mh_a.save_checkpoint(str(p))
    bad = MetropolisHastings(
        lambda x: -0.5 * float(x[0]) ** 2,
        options=MHOptions(dim=1, n_chains=2, init_msg=None),
    )
    with pytest.raises(ValueError):
        bad.restore_checkpoint(str(p))


def test_smc_resume_is_exact(tmp_path):
    """SMC tempering ladder interrupted at a stage boundary and resumed
    from its checkpoint reproduces the uninterrupted run exactly."""
    import jax.numpy as jnp

    from gpmp_tpu.mcmc.smc import (
        SMC, SMCConfig, ParticlesSetConfig,
    )

    def log_mix(x):
        x = x.reshape(-1)
        p = 0.3 * jnp.exp(-0.5 * x**2 / 0.04) + 0.7 * jnp.exp(
            -0.5 * (x - 3.0) ** 2 / 0.16
        )
        return jnp.log(p + 1e-300)

    def logpdf_temp(x, beta):
        return beta * log_mix(jnp.asarray(x))

    box = [[-3.0], [6.0]]
    pc = ParticlesSetConfig(resample_scheme="residual",
                            covariance_method="normal")

    def make(checkpoint=None):
        sc = SMCConfig(compute_next_logpdf_param_method="ess", mh_steps=5,
                       checkpoint_path=checkpoint, checkpoint_every=1)
        return SMC(box=box, n=400, particles_config=pc, smc_config=sc,
                   rng=np.random.default_rng(7))

    # uninterrupted reference
    smc_ref = make()
    smc_ref.step_with_possible_restart(logpdf_temp, 0.01, 1.0, 0.6, None)
    x_ref = np.asarray(smc_ref.particles.x)

    # checkpointed run, stashing every stage
    stashed = []
    smc_a = make(checkpoint=str(tmp_path / "smc.npz"))
    orig = smc_a.save_checkpoint

    def stash(path):
        p = tmp_path / f"smc_{len(stashed)}.npz"
        orig(str(p))
        stashed.append(p)

    smc_a.save_checkpoint = stash
    smc_a.step_with_possible_restart(logpdf_temp, 0.01, 1.0, 0.6, None)
    np.testing.assert_array_equal(np.asarray(smc_a.particles.x), x_ref)
    assert len(stashed) >= 2

    # resume from a mid-ladder checkpoint
    mid = stashed[len(stashed) // 2 - 1]
    smc_b = make()
    smc_b.restore_checkpoint(str(mid))
    assert smc_b._ladder_state is not None
    assert smc_b._ladder_state["current_logpdf_param"] < 1.0
    smc_b.resume_restart(logpdf_temp)
    np.testing.assert_array_equal(np.asarray(smc_b.particles.x), x_ref)


def test_nuts_resume_is_exact(tmp_path):
    """NUTS sampling interrupted at a chunk boundary and resumed must
    be bitwise-identical to both the checkpointed run and the plain
    single-scan run (same key derivation)."""
    import jax.numpy as jnp

    from gpmp_tpu.mcmc import nuts_sample, nuts_resume
    from gpmp_tpu.mcmc.nuts import NUTSOptions

    def log_prob(q):
        return -0.5 * jnp.sum(q**2 / jnp.asarray([0.5, 2.0]))

    q0 = np.zeros((2, 2))
    common = dict(num_warmup=60, seed=11, verbose=0, progress=False,
                  scan_sampling=True)

    s_ref, _ = nuts_sample(log_prob, q0, 120, options=NUTSOptions(**common))

    path = tmp_path / "nuts.npz"
    opts = NUTSOptions(checkpoint_path=str(path), checkpoint_every=40,
                       **common)
    stash = []
    import gpmp_tpu.mcmc.nuts as nuts_mod
    orig_saver_factory = nuts_mod._make_nuts_saver

    def stashing_factory(p, *args):
        inner = orig_saver_factory(p, *args)

        def save_fn(q, t_done):
            inner(q, t_done)
            sp = tmp_path / f"nuts_{t_done}.npz"
            import shutil
            shutil.copy(p, sp)
            stash.append((t_done, sp))

        return save_fn

    nuts_mod._make_nuts_saver = stashing_factory
    try:
        s_a, _ = nuts_sample(log_prob, q0, 120, options=opts)
    finally:
        nuts_mod._make_nuts_saver = orig_saver_factory
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_ref))
    assert len(stash) == 3

    t_mid, p_mid = stash[0]
    assert t_mid == 40
    s_b, info_b = nuts_resume(log_prob, str(p_mid), verbose=0)
    np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_ref))
    assert info_b["accept_stat"].shape == (120, 2)


def test_mh_blocks_per_dispatch_equivalent():
    """blocks_per_dispatch>1 (in-graph Haario, one dispatch per K
    blocks) matches the per-block host-adaptation path."""

    def lt(x):
        return -0.5 * ((x[0] + 1.0) ** 2 / 0.5 + (x[1] - 2.0) ** 2 / 2.0)

    def run(K):
        o = MHOptions(dim=2, n_chains=4, seed=5, adaptation_interval=25,
                      init_msg=None, blocks_per_dispatch=K)
        mh = MetropolisHastings(lt, options=o)
        out = np.asarray(mh.scheduler(np.zeros(2), 6000, 2000))
        return out[:, 2000:, :].reshape(-1, 2)

    s1 = run(1)
    sK = run(8)
    # same key streams; device vs numpy covariance reductions differ at
    # ~1e-16 so a few late accept decisions may flip -- moments agree to
    # ~1e-4, far inside Monte-Carlo noise
    np.testing.assert_allclose(s1.mean(axis=0), sK.mean(axis=0), atol=1e-2)
    np.testing.assert_allclose(s1.var(axis=0), sK.var(axis=0), rtol=1e-2)
    # and be sane vs the true target N([-1,2], diag(0.5,2))
    np.testing.assert_allclose(sK.mean(axis=0), [-1.0, 2.0], atol=0.4)
    np.testing.assert_allclose(sK.var(axis=0), [0.5, 2.0], rtol=0.8)
