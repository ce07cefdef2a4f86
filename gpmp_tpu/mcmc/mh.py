# gpmp_tpu/mcmc/mh.py
"""Adaptive Metropolis-Hastings, TPU-native.

Reference semantics: /root/reference/gpmp/mcmc/mh.py:80-1081 (MHOptions,
multi-chain random-walk MH with Robbins-Monro or Haario adaptation,
burn-in scheduler with early stopping, sliding acceptance rates,
Gelman-Rubin and KS diagnostics).

TPU design: the reference loops steps x chains in Python
(mh.py:422-436); here one adaptation block is ONE jitted
``lax.scan`` over steps with all chains advanced simultaneously
(batched proposal via per-chain Cholesky factors, batched log-target).
Adaptation (block-level, like the reference) and the scheduler run on
host over the accumulated numpy traces.  The target ``log_target`` must
be jax-traceable and is vmapped over chains; non-finite values behave
as -inf (rejection), replacing the reference's exception handling.
"""

import math
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import gpmp_tpu.num as gnp
from gpmp_tpu.config import get_logger


def sample_multivariate_normal_with_jitter(mean, cov, initial_jitter=1e-8,
                                           max_attempts=5, key=None):
    """Draw one mvn sample, escalating diagonal jitter if the Cholesky
    factorization produces NaNs (reference mh.py:59-77)."""
    cov = gnp.asarray(cov)
    dim = cov.shape[0]
    mean = gnp.asarray(mean).reshape(-1)
    if key is None:
        key = gnp.next_key()
    jitter = 0.0
    for _ in range(max_attempts + 1):
        cov_try = cov if jitter == 0.0 else cov + jitter * jnp.eye(dim)
        L = jnp.linalg.cholesky(cov_try)
        if not bool(jnp.any(jnp.isnan(L))):
            eps = jax.random.normal(key, (dim,), dtype=cov.dtype)
            return mean + L @ eps
        jitter = initial_jitter if jitter == 0.0 else 10.0 * jitter
    raise RuntimeError(
        "Covariance matrix is not positive definite even after adding jitter."
    )


@dataclass
class MHOptions:
    """Configuration of the Metropolis-Hastings sampler."""

    dim: int = 1
    n_chains: int = 1
    symmetric: bool = True
    target_acceptance: float = 0.3
    acceptance_tol: float = 0.15
    adaptation_method: str = "Haario"
    proposal_distribution_param_init: Optional[Any] = field(default=None)
    adaptation_interval: int = 50
    freeze_adaptation: bool = True
    discard_burnin: bool = False
    n_pool: int = 1
    RM_adapt_factor: float = 1.0
    RM_diminishing: bool = True
    haario_adapt_factor_burnin_phase: float = 1.0
    haario_adapt_factor_sampling_phase: float = 0.5
    haario_initial_scaling_factor: float = 1.0
    sliding_rate_width: int = 200
    show_global_progress: bool = False
    progress_interval: int = 200
    init_msg: Optional[str] = field(
        default="Sampling from target distribution..."
    )
    seed: Optional[int] = None
    # optional jax.sharding.Mesh: shard the chain axis across devices so
    # each device advances n_chains / n_devices chains (no reference
    # counterpart -- the reference is single-process; SURVEY.md 2.7)
    mesh: Optional[Any] = None
    mesh_axis_name: str = "chains"
    # checkpoint/resume (no reference counterpart -- the reference has
    # no checkpointing anywhere, SURVEY.md section 5): when
    # checkpoint_path is set, the full sampler state is written there
    # every checkpoint_every advance blocks; resume with
    # MetropolisHastings.restore_checkpoint + continue_run.
    # Granularity caveat: checkpoints only land on dispatch boundaries.
    # During burn-in that is every adaptation block; in the frozen
    # sampling phase it is every max_steps_per_dispatch steps, so a
    # frozen phase shorter than max_steps_per_dispatch produces no
    # intermediate checkpoints -- lower max_steps_per_dispatch if a
    # crash mid-sampling must lose less than that many steps
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 10
    # frozen-phase dispatch ceiling: run_samples splits requests larger
    # than this into multiple scans (bounds single-program device time
    # and gives the checkpoint hook periodic boundaries on long runs;
    # the key stream is the same as calling run_samples repeatedly)
    max_steps_per_dispatch: int = 20_000
    # burn-in dispatch granularity: with blocks_per_dispatch > 1, K
    # adaptation blocks (Haario or RM) run as ONE device program with
    # the adaptation in-graph -- K-fold fewer host round-trips, which
    # dominates burn-in wall-clock on high-latency links.  Host-side diagnostics (early stopping, checkpointing)
    # run between dispatches.  Statistically equivalent to the default
    # (the per-block key streams are identical); not bitwise (device
    # covariance reductions vs numpy).  No reference counterpart.
    blocks_per_dispatch: int = 1
    # run the WHOLE burn-in as one device program (a while_loop over
    # adaptation blocks) with the early-stopping convergence checks
    # (sliding acceptance band + Gelman-Rubin) evaluated in-graph after
    # every block, so burn-in costs ONE host round-trip total.  Checks
    # fire at block granularity (the host loop only checks every
    # blocks_per_dispatch blocks, so the in-graph run can stop earlier;
    # the trajectories up to the stopping point are identical to
    # blocks_per_dispatch=1 modulo device-vs-numpy covariance roundoff).
    # Ignored (host loop kept) when checkpointing is on, a custom
    # prop_rnd is set, chains are mesh-sharded, or diag is disabled.
    burnin_in_graph: bool = True

    def __post_init__(self):
        if self.proposal_distribution_param_init is None:
            self.proposal_distribution_param_init = np.ones(self.dim)
        self.acceptance_min = self.target_acceptance - self.acceptance_tol
        self.acceptance_max = self.target_acceptance + self.acceptance_tol


class MetropolisHastings:
    """Multi-chain adaptive random-walk MH.

    Traces after ``scheduler``: ``x`` (n_chains, 1 + n_steps, dim),
    ``accept`` (n_chains, 1 + n_steps), ``log_target_values``; all
    host-side numpy (appended block by block from device).
    """

    def __init__(self, log_target, prop_rnd=None, options: MHOptions = None):
        self.options = options or MHOptions()
        self.log_target = log_target
        self.prop_rnd = prop_rnd

        self.n_chains = self.options.n_chains
        self.dim = self.options.dim
        if prop_rnd is not None:
            # custom proposal: must be a JAX-traceable f(key, x) -> y on
            # one chain state x of shape (dim,) -- the scan kernel vmaps
            # it over chains (reference mh.py:132-142 takes a host-side
            # f(x, chain_idx); the key argument replaces its implicit
            # global RNG)
            try:
                out = jax.eval_shape(
                    prop_rnd,
                    jax.ShapeDtypeStruct((2,), jnp.uint32),
                    jax.ShapeDtypeStruct((self.dim,), gnp._dtype),
                )
            except Exception as exc:
                raise NotImplementedError(
                    "prop_rnd must be a JAX-traceable callable "
                    "f(key, x) -> y with x of shape (dim,); host-side "
                    "proposals cannot run inside the scan kernel "
                    f"(probe failed with {type(exc).__name__}: {exc})"
                ) from exc
            if tuple(out.shape) != (self.dim,):
                raise ValueError(
                    f"prop_rnd must return shape ({self.dim},), got "
                    f"{tuple(out.shape)}"
                )
            self._warned_prop_rnd_adaptation = False
        self.symmetric = self.options.symmetric
        self.target_acceptance = self.options.target_acceptance

        self.proposal_distribution_params = None
        self.haario_adapt_factor = None
        init_scale = self.options.haario_initial_scaling_factor
        if init_scale is None:
            init_scale = 2.38**2 / self.dim
        self.haario_scaling_factors = np.full(self.n_chains, float(init_scale))

        self.x = None
        self.log_target_values = None
        self.accept = None
        self.rates = None

        self.sampling_mode = "init"
        self.burnin_period = 0
        self.global_iter = 0
        self.global_total = 0
        self.start_time = None

        self._key = jax.random.PRNGKey(
            self.options.seed if self.options.seed is not None
            else int(np.random.default_rng().integers(2**31))
        )
        self._block_kernel = None
        self._multiblock_kernel = None
        self._multiblock_kernel_rm = None
        self._multiblock_size = None
        self._sequential_target = False
        self._blocks_since_checkpoint = 0
        self._vmapped_logtarget = jax.jit(jax.vmap(self._safe_log_target))
        self._chain_sharding = None
        if self.options.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_dev = self.options.mesh.shape[self.options.mesh_axis_name]
            if self.n_chains % n_dev != 0:
                raise ValueError(
                    f"n_chains ({self.n_chains}) must be divisible by the "
                    f"mesh axis size ({n_dev})"
                )
            self._chain_sharding = NamedSharding(
                self.options.mesh, PartitionSpec(self.options.mesh_axis_name)
            )

    def _shard_chains(self, *arrays):
        """Place chain-major arrays with the chain axis sharded over the
        mesh (identity without a mesh); GSPMD then runs each device's
        chains locally inside the jitted block kernel."""
        if self._chain_sharding is None:
            return arrays if len(arrays) > 1 else arrays[0]
        out = tuple(jax.device_put(a, self._chain_sharding) for a in arrays)
        return out if len(out) > 1 else out[0]

    # ------------------------------------------------------------------
    # jitted batched kernel
    # ------------------------------------------------------------------
    def _safe_log_target(self, x):
        v = self.log_target(x)
        v = jnp.asarray(v).reshape(())
        return jnp.where(jnp.isnan(v), -jnp.inf, v)

    def _batched_target(self):
        """Chain-batched log target: vmap normally; lax.map when the
        target is not vmappable (e.g. a mesh-sharded criterion from a
        mesh= fit, whose shard_map/device_put internals reject a batch
        axis) -- sequential chains are the right semantics there anyway,
        since each evaluation already spans all devices."""
        if self._sequential_target:
            return lambda xs: lax.map(self._safe_log_target, xs)
        return jax.vmap(self._safe_log_target)

    def _ensure_target_mode(self):
        """Probe (via eval_shape, no RNG consumed) whether the target
        vmaps over chains; fall back to sequential evaluation if not."""
        if self._sequential_target:
            return
        try:
            jax.eval_shape(
                jax.vmap(self._safe_log_target),
                jax.ShapeDtypeStruct(
                    (self.n_chains, self.dim), gnp._dtype
                ),
            )
        except Exception as exc:
            self._fall_back_to_sequential_target(exc)

    def _fall_back_to_sequential_target(self, exc):
        if self._sequential_target:
            raise exc
        # only trace-time failures mean "this target cannot vmap over
        # chains"; runtime/device errors (OOM, interrupts) would make the
        # permanent switch to lax.map a silent order-of-magnitude slowdown
        # for an unrelated, possibly transient cause -- re-raise those
        if isinstance(exc, (RuntimeError, jax.errors.JaxRuntimeError,
                            KeyboardInterrupt, MemoryError)):
            raise exc
        get_logger().warning(
            "log-target is not vmappable over chains (%s); switching to "
            "sequential per-chain evaluation (lax.map).", type(exc).__name__,
        )
        self._sequential_target = True
        self._block_kernel = None
        self._multiblock_kernel = None
        self._multiblock_kernel_rm = None
        self._vmapped_logtarget = jax.jit(self._batched_target())

    def _get_block_kernel(self):
        """scan kernel advancing all chains n steps with fixed per-chain
        proposal Cholesky factors."""
        if self._block_kernel is not None:
            return self._block_kernel

        batched_lt = self._batched_target()
        prop = self.prop_rnd

        def block(x0, lt0, chols, keys):
            def step2(carry, key):
                x, lt = carry
                k_prop, k_u = jax.random.split(key)
                if prop is None:
                    eps = jax.random.normal(k_prop, x.shape, dtype=x.dtype)
                    y = x + jnp.einsum("cij,cj->ci", chols, eps)
                else:
                    pkeys = jax.random.split(k_prop, x.shape[0])
                    y = jax.vmap(prop)(pkeys, x)
                lt_y = batched_lt(y)
                log_a = lt_y - lt
                u = jnp.maximum(
                    jax.random.uniform(k_u, (x.shape[0],), dtype=x.dtype), 1e-300
                )
                accept = jnp.log(u) < log_a
                x_new = jnp.where(accept[:, None], y, x)
                lt_new = jnp.where(accept, lt_y, lt)
                return (x_new, lt_new), (x_new, accept, lt_new)

            (xf, ltf), (xs, accepts, lts) = lax.scan(step2, (x0, lt0), keys)
            return xf, ltf, xs, accepts, lts

        self._block_kernel = jax.jit(block)
        return self._block_kernel

    def _proposal_chols(self):
        """(n_chains, dim, dim) Cholesky factors of per-chain proposal covs."""
        chols = np.empty((self.n_chains, self.dim, self.dim))
        for c in range(self.n_chains):
            cov = self._get_cov_parameter(c)
            cov = np.asarray(gnp.to_np(gnp.asarray(cov)))
            L = np.linalg.cholesky(cov + 0.0)
            chols[c] = L
        return jnp.asarray(chols)

    def _get_cov_parameter(self, chain_idx):
        p = self.proposal_distribution_params[chain_idx]
        p = np.asarray(p)
        if p.ndim == 0:
            return float(p) * np.eye(self.dim)
        if p.ndim == 1:
            return np.diag(p)
        if p.ndim == 2:
            return p
        raise ValueError("proposal_params must be scalar, 1D, or 2D per chain.")

    def _initialize_proposal_distribution_params(self, p_init):
        p_init = np.asarray(gnp.to_np(gnp.asarray(p_init)))
        if p_init.ndim == 1 and p_init.shape[0] == self.dim:
            return [p_init.copy() for _ in range(self.n_chains)]
        if p_init.ndim == 2 and p_init.shape == (self.dim, self.dim):
            return [p_init.copy() for _ in range(self.n_chains)]
        if p_init.ndim == 3 and p_init.shape[0] == self.n_chains:
            return [p_init[i].copy() for i in range(self.n_chains)]
        raise ValueError("Invalid proposal_param_init shape.")

    # ------------------------------------------------------------------
    # block runner
    # ------------------------------------------------------------------
    def run_samples(self, n_steps, show_global_progress=False):
        """Advance all chains n_steps with the current proposal; returns
        per-chain block acceptance rates."""
        if n_steps <= 0:
            return np.zeros(self.n_chains)
        cap = max(1, int(self.options.max_steps_per_dispatch))
        if n_steps > cap:
            rates_sum = np.zeros(self.n_chains)
            done = 0
            while done < n_steps:
                k = min(cap, n_steps - done)
                rates_sum += self.run_samples(k, show_global_progress) * k
                done += k
                self._maybe_checkpoint()
            return rates_sum / n_steps
        i0 = self.global_iter + 1
        key_snapshot = self._key
        try:
            kernel = self._get_block_kernel()
            chols = self._proposal_chols()
            self._key, sub = jax.random.split(self._key)
            keys = jax.random.split(sub, n_steps)
            lt0_np = self.log_target_values[:, self.global_iter]
            x0 = jnp.asarray(self.x[:, self.global_iter, :])
            lt0 = jnp.asarray(lt0_np)
            if np.any(np.isnan(lt0_np)):
                # NaN marks "not yet evaluated" (fresh/restored chains):
                # fill via the CACHED jitted target.  Checked on the
                # host first -- the previous unconditional
                # jnp.where(..., self._batched_target()(x0), ...)
                # re-built and eagerly ran an unjitted vmap of the full
                # criterion EVERY block (~150 ms/block, the dominant MH
                # cost in the round-5 profile).
                lt0 = jnp.where(
                    jnp.isnan(lt0), self._vmapped_logtarget(x0), lt0
                )
            x0, lt0, chols = self._shard_chains(x0, lt0, chols)

            _xf, _ltf, xs, accepts, lts = kernel(x0, lt0, chols, keys)
            # ONE host transfer for the block's traces: separate
            # np.asarray fetches pay a full tunnel round-trip each
            # (~32 ms measured; 3 per block was half the MH wall-clock)
            xs, accepts, lts = jax.device_get((xs, accepts, lts))
        except Exception as exc:
            # e.g. a mesh-sharded criterion that cannot vmap over chains:
            # restore the RNG stream, switch to sequential evaluation,
            # and retry once (a genuine error re-raises from there)
            self._key = key_snapshot
            self._fall_back_to_sequential_target(exc)
            return self.run_samples(n_steps, show_global_progress)
        self.x[:, i0 : i0 + n_steps, :] = np.swapaxes(xs, 0, 1)
        self.accept[:, i0 : i0 + n_steps] = np.swapaxes(accepts, 0, 1)
        self.log_target_values[:, i0 : i0 + n_steps] = np.swapaxes(lts, 0, 1)
        self.global_iter += n_steps

        if show_global_progress and (
            self.global_iter % self.options.progress_interval < n_steps
        ):
            self._print_progress(self.global_iter, self.global_total,
                                 self.start_time)
        return accepts.mean(axis=0)

    # ------------------------------------------------------------------
    # adaptation
    # ------------------------------------------------------------------
    def _diminishing_adaptation_schedule(self, n, n_total, base, final_frac=0.1):
        cosine_component = math.cos(math.pi * n / max(n_total, 1))
        return base * (final_frac + (1 - final_frac) * cosine_component)

    def run_adaptive_RM(self, n_block_size, diminishing=True):
        """Robbins-Monro scale adaptation toward the target acceptance."""
        gamma_base = self.options.RM_adapt_factor
        rates = self.run_samples(
            n_block_size, show_global_progress=self.options.show_global_progress
        )
        if diminishing:
            gamma = self._diminishing_adaptation_schedule(
                self.global_iter, self.burnin_period, gamma_base, final_frac=0.1
            )
        else:
            gamma = gamma_base
        for c in range(self.n_chains):
            self.proposal_distribution_params[c] = self.proposal_distribution_params[
                c
            ] * math.exp(gamma * (float(rates[c]) - self.target_acceptance))
        self._maybe_checkpoint()

    def _compute_covariances_for_block(self, x_block, n_pool=1):
        n_chains = x_block.shape[0]
        if n_chains % n_pool != 0:
            raise ValueError("n_chains must be divisible by n_pool.")
        n_groups = n_chains // n_pool
        covs = np.empty((n_groups, self.dim, self.dim))
        for i, start in enumerate(range(0, n_chains, n_pool)):
            grp = x_block[start : start + n_pool].reshape(-1, self.dim)
            covs[i] = np.cov(grp.T, ddof=1).reshape(self.dim, self.dim)
        return covs

    def update_proposal_covariance_from_samples(self, x_chain=None, raw_cov=None,
                                                scaling=None, epsilon=1e-6):
        """Haario update: new_cov = scaling * EmpCov + epsilon * I."""
        if (x_chain is None) == (raw_cov is None):
            raise ValueError("Must supply exactly one of x_chain or raw_cov.")
        if scaling is None:
            scaling = 2.38**2 / self.dim
        used_cov = (
            raw_cov if raw_cov is not None
            else np.cov(np.asarray(x_chain).T, ddof=1).reshape(self.dim, self.dim)
        )
        return scaling * np.asarray(used_cov) + epsilon * np.eye(self.dim)

    def default_prop_rnd(self, x, chain_idx):
        """Random-walk proposal N(x, Cov_chain) (reference mh.py:298-305)."""
        cov = self._get_cov_parameter(chain_idx)
        return np.asarray(x) + np.asarray(
            sample_multivariate_normal_with_jitter(
                jnp.zeros(self.dim), jnp.asarray(cov)
            )
        )

    def mhstep(self, x_current, chain_idx, log_target_x_current=None):
        """Single host-level MH update for one chain (reference
        mh.py:379-426).  The batched scan kernel is the production path;
        this mirrors the reference's one-step API for parity/debugging.
        Returns (x_next, accepted, log_target_next, log_target_current)."""
        x_current = np.asarray(x_current)
        if log_target_x_current is None or np.isnan(log_target_x_current):
            log_target_x_current = float(
                self._safe_log_target(jnp.asarray(x_current))
            )
        if self.prop_rnd is not None:
            self._key, sub = jax.random.split(self._key)
            y = np.asarray(self.prop_rnd(sub, jnp.asarray(x_current)))
        else:
            y = self.default_prop_rnd(x_current, chain_idx)
        log_target_y = float(self._safe_log_target(jnp.asarray(y)))
        log_a = log_target_y - log_target_x_current
        u = max(float(np.random.default_rng().uniform()), 1e-300)
        if math.log(u) < log_a:
            return y, True, log_target_y, log_target_x_current
        return x_current, False, log_target_x_current, log_target_x_current

    def compute_empirical_covariance_whole_chain(self, burnin=None,
                                                 pooled=False, n_pool=1):
        """Empirical covariance(s) of post-burnin samples: one pooled
        matrix or a list per chain group (reference mh.py:1197-1213)."""
        if burnin is None:
            burnin = self.burnin_period
        if self.x is None:
            raise ValueError("No samples yet.")
        if pooled:
            big = self.x[:, burnin:].reshape(-1, self.dim)
            return np.cov(big.T, ddof=1).reshape(self.dim, self.dim)
        x_pooled = self._get_pooled_samples(burnin, n_pool)
        return [np.cov(x.T, ddof=1).reshape(self.dim, self.dim)
                for x in x_pooled]

    def recompute_all_chains_full_covariance(self, burnin=None, scaling=None,
                                             epsilon=1e-6):
        """Refresh every chain's proposal covariance from its post-burnin
        samples (Haario; reference mh.py:1181-1194)."""
        if burnin is None:
            burnin = self.burnin_period
        if self.x is None:
            raise ValueError("No chain data available.")
        for c in range(self.n_chains):
            self.proposal_distribution_params[c] = (
                self.update_proposal_covariance_from_samples(
                    x_chain=self.x[c, burnin:], scaling=scaling,
                    epsilon=epsilon
                )
            )

    def run_adaptive_Haario(self, n_block_size, epsilon=1e-6):
        """Haario covariance adaptation per chain group."""
        block_rates = self.run_samples(
            n_block_size, show_global_progress=self.options.show_global_progress
        )
        i0 = self.global_iter - n_block_size + 1
        i1 = self.global_iter + 1
        covs = self._compute_covariances_for_block(
            self.x[:, i0:i1, :], self.options.n_pool
        )
        for c in range(self.n_chains):
            grp = c // self.options.n_pool
            self.haario_scaling_factors[c] *= math.exp(
                self.haario_adapt_factor
                * (float(block_rates[c]) - self.target_acceptance)
            )
            self.proposal_distribution_params[c] = (
                self.update_proposal_covariance_from_samples(
                    raw_cov=covs[grp],
                    scaling=self.haario_scaling_factors[c],
                    epsilon=epsilon,
                )
            )
        self._maybe_checkpoint()

    # ------------------------------------------------------------------
    # multi-block device kernel (blocks_per_dispatch > 1)
    # ------------------------------------------------------------------
    def _get_multiblock_kernel(self, n_block_size):
        """Jitted scan-of-scans: K Haario adaptation blocks per dispatch
        with the covariance adaptation in-graph."""
        if (
            self._multiblock_kernel is not None
            and self._multiblock_size == n_block_size
        ):
            return self._multiblock_kernel

        batched_lt = self._batched_target()
        n_pool = self.options.n_pool
        n_groups = self.n_chains // n_pool
        dim = self.dim
        target = self.target_acceptance
        grp_idx = jnp.arange(self.n_chains) // n_pool
        eps_eye = 1e-6 * jnp.eye(dim)
        m_samples = n_pool * n_block_size

        def multi(x0, lt0, cov0, scal0, keys, h):
            def block_body(carry, keys_b):
                x, lt, cov, scal = carry
                chols = jnp.linalg.cholesky(cov)

                def step2(c2, key):
                    xx, ll = c2
                    k_prop, k_u = jax.random.split(key)
                    eps = jax.random.normal(k_prop, xx.shape, dtype=xx.dtype)
                    y = xx + jnp.einsum("cij,cj->ci", chols, eps)
                    lt_y = batched_lt(y)
                    log_a = lt_y - ll
                    u = jnp.maximum(
                        jax.random.uniform(k_u, (xx.shape[0],),
                                           dtype=xx.dtype), 1e-300
                    )
                    accept = jnp.log(u) < log_a
                    x_new = jnp.where(accept[:, None], y, xx)
                    lt_new = jnp.where(accept, lt_y, ll)
                    return (x_new, lt_new), (x_new, accept, lt_new)

                (xf, ltf), (xs, acc, lts) = lax.scan(step2, (x, lt), keys_b)
                rates = jnp.mean(acc, axis=0)  # (C,)
                # pooled empirical covariance per chain group (ddof=1),
                # mirroring _compute_covariances_for_block
                Xg = xs.transpose(1, 0, 2).reshape(
                    n_groups, m_samples, dim
                )
                Xc = Xg - jnp.mean(Xg, axis=1, keepdims=True)
                emp = jnp.einsum("gnd,gne->gde", Xc, Xc) / (m_samples - 1)
                scal2 = scal * jnp.exp(h * (rates - target))
                cov2 = scal2[:, None, None] * emp[grp_idx] + eps_eye
                return (xf, ltf, cov2, scal2), (xs, acc, lts)

            return lax.scan(
                block_body, (x0, lt0, cov0, scal0), keys
            )

        self._multiblock_kernel = jax.jit(multi)
        self._multiblock_size = n_block_size
        return self._multiblock_kernel

    def _get_multiblock_kernel_rm(self, n_block_size):
        """Jitted scan-of-scans for Robbins-Monro adaptation: K blocks
        per dispatch, per-block gamma passed in (diminishing schedule is
        precomputed on the host)."""
        if (
            getattr(self, "_multiblock_kernel_rm", None) is not None
            and self._multiblock_size_rm == n_block_size
        ):
            return self._multiblock_kernel_rm

        batched_lt = self._batched_target()
        target = self.target_acceptance

        def multi(x0, lt0, cov0, keys, gammas):
            def block_body(carry, xs):
                keys_b, gamma = xs
                x, lt, cov = carry
                chols = jnp.linalg.cholesky(cov)

                def step2(c2, key):
                    xx, ll = c2
                    k_prop, k_u = jax.random.split(key)
                    eps = jax.random.normal(k_prop, xx.shape, dtype=xx.dtype)
                    y = xx + jnp.einsum("cij,cj->ci", chols, eps)
                    lt_y = batched_lt(y)
                    log_a = lt_y - ll
                    u = jnp.maximum(
                        jax.random.uniform(k_u, (xx.shape[0],),
                                           dtype=xx.dtype), 1e-300
                    )
                    accept = jnp.log(u) < log_a
                    x_new = jnp.where(accept[:, None], y, xx)
                    lt_new = jnp.where(accept, lt_y, ll)
                    return (x_new, lt_new), (x_new, accept, lt_new)

                (xf, ltf), (xs_, acc, lts) = lax.scan(step2, (x, lt), keys_b)
                rates = jnp.mean(acc, axis=0)
                cov2 = cov * jnp.exp(gamma * (rates - target))[:, None, None]
                return (xf, ltf, cov2), (xs_, acc, lts)

            return lax.scan(block_body, (x0, lt0, cov0), (keys, gammas))

        self._multiblock_kernel_rm = jax.jit(multi)
        self._multiblock_size_rm = n_block_size
        return self._multiblock_kernel_rm

    def run_adaptive_RM_blocks(self, n_blocks, n_block_size,
                               diminishing=True):
        """n_blocks RM adaptation blocks in one device dispatch."""
        C, d = self.n_chains, self.dim
        key_snapshot = self._key
        subs = []
        gammas = []
        base = self.options.RM_adapt_factor
        for k in range(n_blocks):
            self._key, sub = jax.random.split(self._key)
            subs.append(jax.random.split(sub, n_block_size))
            it = self.global_iter + (k + 1) * n_block_size
            gammas.append(
                self._diminishing_adaptation_schedule(
                    it, self.burnin_period, base, final_frac=0.1
                ) if diminishing else base
            )
        keys = jnp.stack(subs)
        gammas_j = jnp.asarray(np.asarray(gammas))

        lt0_np = self.log_target_values[:, self.global_iter]
        x0 = jnp.asarray(self.x[:, self.global_iter, :])
        lt0 = jnp.asarray(lt0_np)
        try:
            if np.any(np.isnan(lt0_np)):
                lt0 = jnp.where(
                    jnp.isnan(lt0), self._vmapped_logtarget(x0), lt0
                )
            cov0 = jnp.stack(
                [self._get_cov_parameter(c) for c in range(C)]
            )

            kern = self._get_multiblock_kernel_rm(n_block_size)
            (xf, ltf, covf), (xs, acc, lts) = kern(
                x0, lt0, cov0, keys, gammas_j
            )
        except Exception as exc:
            self._key = key_snapshot
            self._fall_back_to_sequential_target(exc)
            return self.run_adaptive_RM_blocks(
                n_blocks, n_block_size, diminishing=diminishing
            )

        n_tot = n_blocks * n_block_size
        i0 = self.global_iter + 1
        # one tunnel round-trip for the whole dispatch's traces
        xs, acc, lts = jax.device_get((xs, acc, lts))
        xs = xs.reshape(n_tot, C, d)
        acc = acc.reshape(n_tot, C)
        lts = lts.reshape(n_tot, C)
        self.x[:, i0 : i0 + n_tot, :] = np.swapaxes(xs, 0, 1)
        self.accept[:, i0 : i0 + n_tot] = np.swapaxes(acc, 0, 1)
        self.log_target_values[:, i0 : i0 + n_tot] = np.swapaxes(lts, 0, 1)
        self.global_iter += n_tot
        self.proposal_distribution_params = [
            np.asarray(covf[c]) for c in range(C)
        ]
        self._maybe_checkpoint()

    def run_adaptive_Haario_blocks(self, n_blocks, n_block_size):
        """n_blocks Haario adaptation blocks in one device dispatch."""
        C, d = self.n_chains, self.dim
        key_snapshot = self._key
        subs = []
        for _ in range(n_blocks):
            self._key, sub = jax.random.split(self._key)
            subs.append(jax.random.split(sub, n_block_size))
        keys = jnp.stack(subs)  # (K, block, 2)

        lt0_np = self.log_target_values[:, self.global_iter]
        x0 = jnp.asarray(self.x[:, self.global_iter, :])
        lt0 = jnp.asarray(lt0_np)
        try:
            if np.any(np.isnan(lt0_np)):
                lt0 = jnp.where(
                    jnp.isnan(lt0), self._vmapped_logtarget(x0), lt0
                )
            cov0 = jnp.stack(
                [self._get_cov_parameter(c) for c in range(C)]
            )
            scal0 = jnp.asarray(self.haario_scaling_factors)

            kern = self._get_multiblock_kernel(n_block_size)
            (xf, ltf, covf, scalf), (xs, acc, lts) = kern(
                x0, lt0, cov0, scal0, keys,
                jnp.asarray(float(self.haario_adapt_factor)),
            )
        except Exception as exc:
            self._key = key_snapshot
            self._fall_back_to_sequential_target(exc)
            return self.run_adaptive_Haario_blocks(n_blocks, n_block_size)

        n_tot = n_blocks * n_block_size
        i0 = self.global_iter + 1
        # one tunnel round-trip for the whole dispatch's traces
        xs, acc, lts = jax.device_get((xs, acc, lts))
        xs = xs.reshape(n_tot, C, d)
        acc = acc.reshape(n_tot, C)
        lts = lts.reshape(n_tot, C)
        self.x[:, i0 : i0 + n_tot, :] = np.swapaxes(xs, 0, 1)
        self.accept[:, i0 : i0 + n_tot] = np.swapaxes(acc, 0, 1)
        self.log_target_values[:, i0 : i0 + n_tot] = np.swapaxes(lts, 0, 1)
        self.global_iter += n_tot
        self.proposal_distribution_params = [
            np.asarray(covf[c]) for c in range(C)
        ]
        self.haario_scaling_factors = np.asarray(scalf)
        self._maybe_checkpoint()

    # ------------------------------------------------------------------
    # whole-burn-in device kernel (burnin_in_graph)
    # ------------------------------------------------------------------
    def _get_burnin_kernel(self, n_block_size, max_blocks, n_diag, method):
        """One device program for the whole burn-in: while_loop over
        adaptation blocks (Haario or RM math identical to the multiblock
        kernels) with the run_burnin early-stopping rule evaluated
        in-graph after every block.  Traces land in preallocated step-
        major buffers; the loop exits at the first converged block."""
        sig = (n_block_size, max_blocks, n_diag, method)
        if getattr(self, "_burnin_kernel_sig", None) == sig:
            return self._burnin_kernel

        batched_lt = self._batched_target()
        C, d = self.n_chains, self.dim
        n_pool = self.options.n_pool
        n_groups = C // n_pool
        grp_idx = jnp.arange(C) // n_pool
        eps_eye = 1e-6 * jnp.eye(d)
        target = self.target_acceptance
        m_samples = n_pool * n_block_size
        block = n_block_size
        T = max_blocks * block
        W = min(max(1, int(self.options.sliding_rate_width)), n_diag)
        amin = self.options.acceptance_min
        amax = self.options.acceptance_max
        thr2 = 1.1 ** 2
        haario = method == "haario"

        step_iota = jnp.arange(1 + T)

        def kernel(x0, lt0, cov0, scal0, keys, h, gammas):
            xs_buf = jnp.zeros((1 + T, C, d), x0.dtype).at[0].set(x0)
            acc_buf = jnp.zeros((1 + T, C), x0.dtype).at[0].set(1.0)
            lts_buf = jnp.zeros((1 + T, C), lt0.dtype).at[0].set(lt0)

            def run_block(x, lt, cov, scal, b):
                chols = jnp.linalg.cholesky(cov)

                def step2(c2, key):
                    xx, ll = c2
                    k_prop, k_u = jax.random.split(key)
                    eps = jax.random.normal(k_prop, xx.shape, dtype=xx.dtype)
                    y = xx + jnp.einsum("cij,cj->ci", chols, eps)
                    lt_y = batched_lt(y)
                    u = jnp.maximum(
                        jax.random.uniform(k_u, (xx.shape[0],),
                                           dtype=xx.dtype), 1e-300
                    )
                    accept = jnp.log(u) < lt_y - ll
                    x_new = jnp.where(accept[:, None], y, xx)
                    lt_new = jnp.where(accept, lt_y, ll)
                    return (x_new, lt_new), (x_new, accept, lt_new)

                (xf, ltf), (xs, acc, lts) = lax.scan(step2, (x, lt), keys[b])
                rates = jnp.mean(acc, axis=0)
                if haario:
                    Xg = xs.transpose(1, 0, 2).reshape(n_groups, m_samples, d)
                    Xc = Xg - jnp.mean(Xg, axis=1, keepdims=True)
                    emp = jnp.einsum("gnd,gne->gde", Xc, Xc) / (m_samples - 1)
                    scal2 = scal * jnp.exp(h * (rates - target))
                    cov2 = scal2[:, None, None] * emp[grp_idx] + eps_eye
                else:
                    scal2 = scal
                    cov2 = cov * jnp.exp(
                        gammas[b] * (rates - target)
                    )[:, None, None]
                return xf, ltf, cov2, scal2, xs, acc, lts

            def converged_now(acc_buf, xs_buf, n_max):
                # sliding acceptance rates over the conceptual history
                # accept[:, :n_max] (includes the accept=1 initial entry,
                # excludes the newest step -- compute_sliding_rates
                # semantics), then min/max over the trailing n_diag
                valid = (step_iota < n_max).astype(acc_buf.dtype)
                cs = jnp.cumsum(acc_buf * valid[:, None], axis=0)
                cs_shift = jnp.concatenate(
                    [jnp.zeros((W, C), cs.dtype), cs[:-W]], axis=0
                )
                denom = jnp.minimum(step_iota + 1, W).astype(cs.dtype)
                rate = (cs - cs_shift) / denom[:, None]
                in_win = (step_iota >= n_max - n_diag) & (step_iota < n_max)
                min_ar = jnp.min(jnp.where(in_win[:, None], rate, jnp.inf))
                max_ar = jnp.max(jnp.where(in_win[:, None], rate, -jnp.inf))
                acc_ok = (min_ar > amin) & (max_ar < amax)
                if C < 2:
                    return acc_ok
                # Gelman-Rubin over x[:, n_max-n_diag : n_max]
                m = in_win.astype(xs_buf.dtype)[:, None, None]
                s1 = jnp.sum(xs_buf * m, axis=0)              # (C, d)
                s2 = jnp.sum(xs_buf * xs_buf * m, axis=0)
                mean_c = s1 / n_diag
                var_c = (s2 - n_diag * mean_c**2) / (n_diag - 1)
                W_stat = jnp.mean(var_c, axis=0)
                gm = jnp.mean(mean_c, axis=0)
                B = n_diag * jnp.sum((mean_c - gm) ** 2, axis=0) / (C - 1)
                var_post = (n_diag - 1) / n_diag * W_stat + B / n_diag
                rhat_ok = jnp.all(var_post < thr2 * W_stat)
                return acc_ok & rhat_ok

            def cond(carry):
                b, conv = carry[4], carry[5]
                return (b < max_blocks) & jnp.logical_not(conv)

            def body(carry):
                x, lt, cov, scal, b, _conv, xs_buf, acc_buf, lts_buf = carry
                xf, ltf, cov2, scal2, xs, acc, lts = run_block(
                    x, lt, cov, scal, b
                )
                i0 = 1 + b * block
                xs_buf = lax.dynamic_update_slice(xs_buf, xs, (i0, 0, 0))
                acc_buf = lax.dynamic_update_slice(
                    acc_buf, acc.astype(acc_buf.dtype), (i0, 0)
                )
                lts_buf = lax.dynamic_update_slice(lts_buf, lts, (i0, 0))
                n_max = (b + 1) * block
                conv = jnp.where(
                    n_max >= n_diag,
                    converged_now(acc_buf, xs_buf, n_max),
                    False,
                )
                return (xf, ltf, cov2, scal2, b + 1, conv,
                        xs_buf, acc_buf, lts_buf)

            init = (x0, lt0, cov0, scal0, jnp.int32(0), jnp.bool_(False),
                    xs_buf, acc_buf, lts_buf)
            (xf, ltf, covf, scalf, b, conv,
             xs_buf, acc_buf, lts_buf) = lax.while_loop(cond, body, init)
            return xf, ltf, covf, scalf, b, conv, xs_buf, acc_buf, lts_buf

        self._burnin_kernel = jax.jit(kernel)
        self._burnin_kernel_sig = sig
        return self._burnin_kernel

    def _run_burnin_in_graph(self, n_blocks, n_diag_samples, method):
        """Whole-burn-in single dispatch.  Returns None when ineligible
        or on a trace failure (caller keeps the host block loop), else
        the converged_early flag."""
        opts = self.options
        block = opts.adaptation_interval
        if (
            not opts.burnin_in_graph
            or n_blocks < 1
            or opts.checkpoint_path is not None
            or self.prop_rnd is not None
            or self._chain_sharding is not None
            or n_diag_samples < max(1, int(opts.sliding_rate_width))
            or self.global_iter != 0
        ):
            return None

        C, d = self.n_chains, self.dim
        key_snapshot = self._key
        key = key_snapshot
        subs = []
        gammas = []
        base = opts.RM_adapt_factor
        for k in range(n_blocks):
            key, sub = jax.random.split(key)
            subs.append(jax.random.split(sub, block))
            it = (k + 1) * block
            gammas.append(
                self._diminishing_adaptation_schedule(
                    it, self.burnin_period, base, final_frac=0.1
                ) if opts.RM_diminishing else base
            )
        keys = jnp.stack(subs)
        gammas_j = jnp.asarray(np.asarray(gammas))

        x0 = jnp.asarray(self.x[:, 0, :])
        try:
            lt0 = self._vmapped_logtarget(x0)
            cov0 = jnp.stack([self._get_cov_parameter(c) for c in range(C)])
            scal0 = jnp.asarray(self.haario_scaling_factors)
            kern = self._get_burnin_kernel(
                block, n_blocks, n_diag_samples, method
            )
            (xf, ltf, covf, scalf, b, conv, xs_buf, acc_buf,
             lts_buf) = kern(x0, lt0, cov0, scal0, keys,
                             jnp.asarray(float(self.haario_adapt_factor)),
                             gammas_j)
            b = int(b)
        except Exception as exc:
            if isinstance(exc, (KeyboardInterrupt, MemoryError)):
                raise
            get_logger().warning(
                "in-graph burn-in unavailable (%s: %s); falling back to "
                "the host block loop.", type(exc).__name__, exc,
            )
            return None

        n_tot = b * block
        self.x[:, 1 : 1 + n_tot, :] = np.swapaxes(
            np.asarray(xs_buf[1 : 1 + n_tot]), 0, 1
        )
        self.accept[:, 1 : 1 + n_tot] = np.swapaxes(
            np.asarray(acc_buf[1 : 1 + n_tot]), 0, 1
        )
        self.log_target_values[:, 1 : 1 + n_tot] = np.swapaxes(
            np.asarray(lts_buf[1 : 1 + n_tot]), 0, 1
        )
        self.global_iter = n_tot
        # advance the RNG stream exactly as the host loop would have
        key = key_snapshot
        for _ in range(b):
            key, _sub = jax.random.split(key)
        self._key = key
        self.proposal_distribution_params = [
            np.asarray(covf[c]) for c in range(C)
        ]
        self.haario_scaling_factors = np.asarray(scalf)
        converged_early = bool(conv)
        if converged_early:
            print(
                f"\nEarly stopping: convergence detected during burn-in "
                f"at iter = {self.global_iter}."
            )
            self.burnin_period = self.global_iter
        return converged_early

    def _maybe_checkpoint(self):
        """Periodic checkpoint at adaptation-block boundaries (AFTER the
        proposal update, so a resumed run replays the exact state the
        uninterrupted run would have used next).  Frozen-phase sampling
        is a single scan, so it offers no intermediate boundaries."""
        if self.options.checkpoint_path is None:
            return
        self._blocks_since_checkpoint += 1
        if self._blocks_since_checkpoint >= max(
            1, self.options.checkpoint_every
        ):
            self.save_checkpoint(self.options.checkpoint_path)
            self._blocks_since_checkpoint = 0

    def run_adaptive(self, n_samples):
        if self._adaptation_bypass(n_samples):
            return
        n_blocks = n_samples // self.options.adaptation_interval
        remainder = n_samples - n_blocks * self.options.adaptation_interval
        method = self.options.adaptation_method.lower()
        if method not in ("rm", "haario"):
            raise ValueError("adaptation_method must be 'RM' or 'Haario'.")
        K = max(1, int(self.options.blocks_per_dispatch))
        if K > 1:
            block = 0
            while block < n_blocks:
                k = min(K, n_blocks - block)
                if method == "haario":
                    self.run_adaptive_Haario_blocks(
                        k, self.options.adaptation_interval
                    )
                else:
                    self.run_adaptive_RM_blocks(
                        k, self.options.adaptation_interval,
                        diminishing=False,
                    )
                block += k
            n_blocks = 0
        for _ in range(n_blocks):
            if method == "rm":
                self.run_adaptive_RM(self.options.adaptation_interval,
                                     diminishing=False)
            elif method == "haario":
                self.run_adaptive_Haario(self.options.adaptation_interval)
            else:
                raise ValueError("adaptation_method must be 'RM' or 'Haario'.")
        if remainder > 0:
            self.run_samples(
                remainder, show_global_progress=self.options.show_global_progress
            )

    # ------------------------------------------------------------------
    # scheduler
    # ------------------------------------------------------------------
    def set_mode(self, mode):
        self.sampling_mode = mode
        if mode == "burnin":
            self.haario_adapt_factor = self.options.haario_adapt_factor_burnin_phase
        elif mode == "sampling_adaptation":
            self.haario_adapt_factor = (
                self.options.haario_adapt_factor_sampling_phase
            )

    def _adaptation_bypass(self, n_samples):
        """With a custom prop_rnd there is nothing to adapt: Haario/RM
        tune the Gaussian random walk the custom proposal replaces.  Run
        the fixed-proposal kernel instead (warning once)."""
        if self.prop_rnd is None:
            return False
        if not self._warned_prop_rnd_adaptation:
            get_logger().warning(
                "custom prop_rnd replaces the Gaussian random walk, so "
                "Haario/RM adaptation does not apply; running the "
                "adaptation/burn-in phase with the fixed custom proposal."
            )
            self._warned_prop_rnd_adaptation = True
        self.run_samples(
            n_samples, show_global_progress=self.options.show_global_progress
        )
        return True

    def run_burnin(self, burnin_period, diag=True, n_blocks_convergence_diag=20):
        """Burn-in block loop with early stopping on (acceptance window AND
        Gelman-Rubin) convergence (reference mh.py:534-618)."""
        if self._adaptation_bypass(burnin_period):
            return
        n_blocks = burnin_period // self.options.adaptation_interval
        remainder = burnin_period - n_blocks * self.options.adaptation_interval
        method = self.options.adaptation_method.lower()
        if method not in ("rm", "haario"):
            raise ValueError("adaptation_method must be 'RM' or 'Haario'.")
        n_diag_samples = n_blocks_convergence_diag * self.options.adaptation_interval
        converged_early = False

        if diag:
            in_graph = self._run_burnin_in_graph(
                n_blocks, n_diag_samples, method
            )
            if in_graph is not None:
                converged_early = in_graph
                n_blocks = 0

        K = max(1, int(self.options.blocks_per_dispatch))

        block = 0
        while block < n_blocks:
            if K > 1:
                k = min(K, n_blocks - block)
                if method == "haario":
                    self.run_adaptive_Haario_blocks(
                        k, self.options.adaptation_interval
                    )
                else:
                    self.run_adaptive_RM_blocks(
                        k, self.options.adaptation_interval,
                        diminishing=self.options.RM_diminishing,
                    )
                block += k
            elif method == "rm":
                self.run_adaptive_RM(self.options.adaptation_interval,
                                     diminishing=self.options.RM_diminishing)
                block += 1
            elif method == "haario":
                self.run_adaptive_Haario(self.options.adaptation_interval)
                block += 1
            else:
                raise ValueError("adaptation_method must be 'RM' or 'Haario'.")

            if diag and self.global_iter >= n_diag_samples:
                rates = self.compute_sliding_rates(self.options.sliding_rate_width)
                i0 = max(0, self.global_iter - n_diag_samples)
                rates_w = rates[:, i0 : self.global_iter]
                min_ar = rates_w.min(axis=1)
                max_ar = rates_w.max(axis=1)
                if self.n_chains >= 2:
                    gr = self.check_convergence_gelman_rubin(
                        last_n_samples=n_diag_samples, verbose=False
                    )
                else:
                    gr = {"ok": True}
                if (
                    np.all(min_ar > self.options.acceptance_min)
                    and np.all(max_ar < self.options.acceptance_max)
                    and gr.get("ok", False)
                ):
                    print(
                        f"\nEarly stopping: convergence detected during burn-in "
                        f"at iter = {self.global_iter}."
                    )
                    self.burnin_period = self.global_iter
                    converged_early = True
                    break

        if (not converged_early) and remainder > 0:
            self.run_samples(
                remainder, show_global_progress=self.options.show_global_progress
            )

        if diag:
            print("\nConvergence Diagnostics after burn-in:")
            if self.global_iter <= 1:
                print("Not enough samples to run diagnostics after burn-in.")
                return
            rates = self.compute_sliding_rates(self.options.sliding_rate_width)
            self.check_acceptance_rates(
                last_n_samples=n_diag_samples,
                rates=rates,
                low_threshold=self.options.acceptance_min,
                high_threshold=self.options.acceptance_max,
            )
            if self.n_chains >= 2:
                self.check_convergence_gelman_rubin(last_n_samples=n_diag_samples)

    def scheduler(self, chains_state_initial, n_steps_total, burnin_period,
                  replicate_initial_state=True):
        """Full run: burn-in (adaptive) then sampling (frozen or adaptive)."""
        chains_state_initial = np.asarray(
            gnp.to_np(gnp.asarray(chains_state_initial))
        )
        if chains_state_initial.ndim == 1:
            chains_state_initial = chains_state_initial.reshape(1, -1)
        if (
            chains_state_initial.shape == (1, self.dim)
            and replicate_initial_state
            and self.n_chains > 1
        ):
            chains_state_initial = np.tile(chains_state_initial,
                                           (self.n_chains, 1))
        if chains_state_initial.shape != (self.n_chains, self.dim):
            raise ValueError(
                f"chains_state_initial must have shape "
                f"({self.n_chains}, {self.dim}) or be 1D if "
                f"replicate_initial_state=True. Got {chains_state_initial.shape}."
            )
        if n_steps_total < burnin_period:
            raise ValueError("Total steps < burnin")

        self._ensure_target_mode()
        self.proposal_distribution_params = (
            self._initialize_proposal_distribution_params(
                self.options.proposal_distribution_param_init
            )
        )
        self.x = np.empty((self.n_chains, 1 + n_steps_total, self.dim))
        self.accept = np.zeros((self.n_chains, 1 + n_steps_total))
        self.log_target_values = np.full((self.n_chains, 1 + n_steps_total),
                                         np.nan)
        self.burnin_period = burnin_period
        self.global_iter = 0
        self.global_total = 1 + n_steps_total
        self.start_time = time.time()
        self.x[:, 0, :] = chains_state_initial
        self.accept[:, 0] = 1.0

        if self.options.init_msg is not None:
            print(self.options.init_msg)
            print(f"  Dimension: {self.dim}")
            print(f"  Total steps: {n_steps_total}")
            print(f"  Burn-in: {burnin_period}")
            print(f"  Chains: {self.n_chains}")

        self.set_mode("burnin")
        self.run_burnin(burnin_period)

        n_remain = n_steps_total - self.burnin_period
        if self.options.freeze_adaptation:
            self.set_mode("sampling_freeze_adaptation")
            self.run_samples(
                n_remain, show_global_progress=self.options.show_global_progress
            )
        else:
            self.set_mode("sampling_adaptation")
            self.run_adaptive(n_remain)

        return self._finish_run()

    def _finish_run(self):
        self.global_total = self.global_iter
        if self.options.show_global_progress:
            self._print_final_time(self.global_total, self.start_time)

        self.rates = self.compute_sliding_rates(self.options.sliding_rate_width)

        out = (
            self.x[:, self.burnin_period : self.global_total + 1]
            if self.options.discard_burnin
            else self.x[:, : self.global_total + 1]
        )
        return gnp.asarray(out)

    # ------------------------------------------------------------------
    # checkpoint / resume (no reference counterpart; SURVEY.md section 5)
    # ------------------------------------------------------------------
    def get_state(self):
        """(arrays, meta) snapshot of the full sampler state."""
        arrays = {
            "x": self.x,
            "accept": self.accept,
            "log_target_values": self.log_target_values,
            "haario_scaling_factors": self.haario_scaling_factors,
            "key": np.asarray(
                jax.random.key_data(self._key)
                if jnp.issubdtype(self._key.dtype, jax.dtypes.prng_key)
                else self._key
            ),
        }
        if self.proposal_distribution_params is not None:
            for c, p in enumerate(self.proposal_distribution_params):
                arrays[f"proposal_param_{c}"] = np.asarray(p)
        meta = {
            "kind": "MetropolisHastings",
            "n_chains": self.n_chains,
            "dim": self.dim,
            "sampling_mode": self.sampling_mode,
            "burnin_period": int(self.burnin_period),
            "global_iter": int(self.global_iter),
            "global_total": int(self.global_total),
            "haario_adapt_factor": self.haario_adapt_factor,
            "n_proposal_params": (
                0 if self.proposal_distribution_params is None
                else len(self.proposal_distribution_params)
            ),
        }
        return arrays, meta

    def set_state(self, arrays, meta):
        if meta.get("kind") != "MetropolisHastings":
            raise ValueError(f"Not an MH checkpoint: {meta.get('kind')!r}")
        if (meta["n_chains"], meta["dim"]) != (self.n_chains, self.dim):
            raise ValueError(
                "Checkpoint shape mismatch: options give "
                f"({self.n_chains}, {self.dim}), checkpoint has "
                f"({meta['n_chains']}, {meta['dim']})."
            )
        self.x = np.array(arrays["x"])
        self.accept = np.array(arrays["accept"])
        self.log_target_values = np.array(arrays["log_target_values"])
        self.haario_scaling_factors = np.array(
            arrays["haario_scaling_factors"]
        )
        n_pp = meta.get("n_proposal_params", 0)
        if n_pp:
            self.proposal_distribution_params = [
                np.array(arrays[f"proposal_param_{c}"]) for c in range(n_pp)
            ]
        key = jnp.asarray(arrays["key"])
        if jnp.issubdtype(self._key.dtype, jax.dtypes.prng_key):
            key = jax.random.wrap_key_data(key)
        self._key = key
        self.sampling_mode = meta["sampling_mode"]
        self.burnin_period = meta["burnin_period"]
        self.global_iter = meta["global_iter"]
        self.global_total = meta["global_total"]
        self.haario_adapt_factor = meta["haario_adapt_factor"]
        if self.start_time is None:
            self.start_time = time.time()

    def save_checkpoint(self, path):
        from .checkpoint import save_sampler_checkpoint

        arrays, meta = self.get_state()
        save_sampler_checkpoint(path, arrays, meta)

    def restore_checkpoint(self, path):
        """Load state saved by save_checkpoint into this sampler (the
        log-target and options are re-supplied by the constructor)."""
        from .checkpoint import load_sampler_checkpoint

        arrays, meta = load_sampler_checkpoint(path)
        self.set_state(arrays, meta)

    def continue_run(self):
        """Resume an interrupted scheduler() run from restored state:
        finishes the remaining burn-in and/or sampling steps and returns
        the same trace array scheduler() would have."""
        if self.x is None:
            raise ValueError("No state to continue from; restore first.")
        self._ensure_target_mode()
        n_steps_total = self.global_total - 1
        self.start_time = time.time()
        if (
            self.sampling_mode in ("init", "burnin")
            and self.global_iter < self.burnin_period
        ):
            self.set_mode("burnin")
            self.run_burnin(self.burnin_period - self.global_iter)
        n_remain = n_steps_total - max(self.global_iter, self.burnin_period)
        if n_remain > 0:
            if self.options.freeze_adaptation:
                self.set_mode("sampling_freeze_adaptation")
                self.run_samples(
                    n_remain,
                    show_global_progress=self.options.show_global_progress,
                )
            else:
                self.set_mode("sampling_adaptation")
                self.run_adaptive(n_remain)
        return self._finish_run()

    # ------------------------------------------------------------------
    # diagnostics
    # ------------------------------------------------------------------
    def compute_sliding_rates(self, n_block_size):
        """Sliding-window acceptance rates, shape (n_chains, global_iter)."""
        if self.accept is None:
            raise ValueError(
                "No acceptance data available to compute sliding rates."
            )
        n_max = self.global_iter
        if n_max <= 0:
            return np.empty((self.n_chains, 0))
        window = min(max(1, int(n_block_size)), n_max)
        acc = self.accept[:, :n_max]
        cumsum = np.cumsum(acc, axis=1)
        rates = np.empty((self.n_chains, n_max))
        rates[:, :window] = cumsum[:, :window] / (np.arange(window) + 1)
        if n_max > window:
            rates[:, window:] = (cumsum[:, window:] - cumsum[:, :-window]) / window
        return rates

    def check_acceptance_rates(self, burnin_period=None, last_n_samples=None,
                               low_threshold=0.15, high_threshold=0.40,
                               rates=None, verbose=True):
        if burnin_period is None:
            burnin_period = self.burnin_period
        if rates is None:
            if self.rates is None:
                if verbose:
                    print("No sliding acceptance rates available.")
                return {}
            rates_data = self.rates
        else:
            rates_data = rates

        i0 = (
            burnin_period
            if last_n_samples is None
            else max(0, self.global_iter - last_n_samples)
        )
        i1 = self.global_iter
        if i1 - i0 <= 1:
            raise ValueError("Not enough samples to compute acceptance rates.")

        data = rates_data[:, i0:i1]
        min_ar = float(data.min())
        max_ar = float(data.max())
        ok = (min_ar >= low_threshold) and (max_ar <= high_threshold)
        if verbose:
            print("[check_acceptance_rates]")
            if not ok:
                if min_ar < low_threshold:
                    print(f"WARNING: Min acceptance rate ({min_ar:.3f}) is "
                          f"below the threshold of {low_threshold:.2f}.")
                if max_ar > high_threshold:
                    print(f"WARNING: Max acceptance rate ({max_ar:.3f}) is "
                          f"above the threshold of {high_threshold:.2f}.")
            else:
                print("PASS: Acceptance rates within tolerance bounds")
            print(f"  Min = {min_ar:.3f},  Max = {max_ar:.3f}")
        return {"min_ar": min_ar, "max_ar": max_ar, "ok": ok}

    def compute_gelman_rubin_rhat(self, burnin_period=None, last_n_samples=None):
        """Split-free Gelman-Rubin R-hat per parameter."""
        if burnin_period is None:
            burnin_period = self.burnin_period
        if self.x is None:
            raise ValueError("No chain data available.")
        if self.n_chains < 2:
            raise ValueError("At least 2 chains are required.")
        i0 = (
            burnin_period
            if last_n_samples is None
            else max(0, self.global_iter - last_n_samples)
        )
        i1 = self.global_iter
        n_block = i1 - i0
        if n_block <= 1:
            raise ValueError(
                "Not enough samples to compute Gelman-Rubin diagnostic."
            )
        block = self.x[:, i0:i1, :]
        chain_means = block.mean(axis=1)
        chain_vars = block.var(axis=1, ddof=1)
        W = chain_vars.mean(axis=0)
        B = n_block * chain_means.var(axis=0, ddof=1)
        var_post = ((n_block - 1) / n_block) * W + B / n_block
        # Degenerate within-chain variance (all chains stuck at the same
        # point in a component): report R-hat = inf if the chains
        # disagree, 1.0 if they all sit on one value -- no NaN/inf
        # RuntimeWarning from a 0/0 divide.
        with np.errstate(divide="ignore", invalid="ignore"):
            rhat = np.sqrt(var_post / W)
        degenerate = W == 0.0
        if np.any(degenerate):
            rhat = np.where(degenerate & (var_post > 0.0), np.inf, rhat)
            rhat = np.where(degenerate & (var_post == 0.0), 1.0, rhat)
        return rhat

    def check_convergence_gelman_rubin(self, burnin_period=0, last_n_samples=None,
                                       threshold=1.1, verbose=True):
        rhat = self.compute_gelman_rubin_rhat(
            burnin_period=burnin_period, last_n_samples=last_n_samples
        )
        ok = bool(np.all(rhat < threshold))
        if verbose:
            if ok:
                print(f"[check_gelman_rubin_rhat]\nPASS: All R-hat < {threshold}.")
            else:
                print(f"[check_gelman_rubin_rhat]\nWARNING: Some R-hat >= "
                      f"{threshold}.")
            print(f"  R-hat values: {rhat}")
        return {"rhat": rhat, "ok": ok}

    def ks_statistics(self, n_blocks, n_block_size, alpha=0.01,
                      return_significance=True, return_statistic=False):
        """Pairwise two-sample KS tests between trailing blocks of each
        chain (per dimension); high significant fraction flags
        non-convergence."""
        from scipy.stats import ks_2samp

        if self.x is None:
            raise ValueError("No chain data available. Run sampler first.")
        n_chains, n_steps, dim = self.x.shape
        needed = n_blocks * n_block_size
        if needed > n_steps:
            raise ValueError(
                f"Requested {n_blocks} blocks of size {n_block_size} "
                f"({needed} total) but chain only has {n_steps} samples."
            )
        blocks = []
        start_index = n_steps - needed
        for chain_idx in range(n_chains):
            for b in range(n_blocks):
                s = start_index + b * n_block_size
                blocks.append(self.x[chain_idx, s : s + n_block_size, :])
        B = len(blocks)
        pvalue_matrix = np.zeros((dim, B, B))
        ks_matrix = np.zeros((dim, B, B)) if return_statistic else None
        for d in range(dim):
            for i in range(B):
                for j in range(i + 1, B):
                    result = ks_2samp(blocks[i][:, d], blocks[j][:, d],
                                      alternative="two-sided")
                    if return_statistic:
                        ks_matrix[d, i, j] = ks_matrix[d, j, i] = result.statistic
                    pvalue_matrix[d, i, j] = pvalue_matrix[d, j, i] = result.pvalue
        if return_significance:
            significance = pvalue_matrix < alpha
            if return_statistic:
                return ks_matrix, pvalue_matrix, significance
            return pvalue_matrix, significance
        if return_statistic:
            return ks_matrix, pvalue_matrix
        return pvalue_matrix

    def check_convergence_ks(self, multi_block_n_blocks=5, multi_block_size=100,
                             single_block_size=None, alpha=0.01,
                             fraction_threshold=0.5, verbose=True):
        if self.x is None:
            raise ValueError("No chain data. Please run or load the sampler first.")
        n_chains, n_steps, dim = self.x.shape
        needed_multi = multi_block_n_blocks * multi_block_size
        if n_steps < needed_multi:
            raise ValueError(
                f"Need at least {needed_multi} samples for multi-block check."
            )
        _ksA, _pA, sigA = self.ks_statistics(
            n_blocks=multi_block_n_blocks, n_block_size=multi_block_size,
            alpha=alpha, return_significance=True, return_statistic=True,
        )
        frac_sig_multi = float(sigA.sum() / sigA.size)

        if single_block_size is None:
            single_block_size = needed_multi
        if n_steps < single_block_size:
            raise ValueError(
                f"Need at least {single_block_size} samples for "
                f"single-block check."
            )
        _ksB, _pB, sigB = self.ks_statistics(
            n_blocks=1, n_block_size=single_block_size, alpha=alpha,
            return_significance=True, return_statistic=True,
        )
        frac_sig_single = float(sigB.sum() / sigB.size)

        ok = (frac_sig_multi < fraction_threshold) and (
            frac_sig_single < fraction_threshold
        )
        results = {
            "multi_block": {
                "n_blocks": multi_block_n_blocks,
                "block_size": multi_block_size,
                "frac_significant": frac_sig_multi,
            },
            "single_block": {
                "n_blocks": 1,
                "block_size": single_block_size,
                "frac_significant": frac_sig_single,
            },
            "ok": ok,
        }
        if verbose:
            print("[check_convergence_ks]")
            print("PASS: Both KS checks below threshold." if ok
                  else "WARNING: At least one KS check exceeded threshold.")
            print(f"  Multi-block: frac_significant = {frac_sig_multi:.2%} "
                  f"(blocks = {multi_block_n_blocks} x {multi_block_size})")
            print(f"  Single-block: frac_significant = {frac_sig_single:.2%} "
                  f"(1 x {single_block_size})")
            print(f"  Threshold = {fraction_threshold:.2%}, alpha = {alpha}")
        return results

    # ------------------------------------------------------------------
    # progress + plots
    # ------------------------------------------------------------------
    def _print_progress(self, iteration, total_steps, start_time):
        elapsed = time.time() - start_time
        avg = elapsed / (iteration + 1)
        remaining = avg * (total_steps - (iteration + 1))
        pct = (iteration + 1) / total_steps * 100
        print(f"  Progress: {pct:5.2f}% | Time left: {remaining:5.1f}s      ",
              end="\r")

    def _print_final_time(self, total_steps, start_time):
        elapsed = time.time() - start_time
        print(f"  Progress: 100.00% complete | Total time: {elapsed:.3f}s")
        print(f"  Total proposals: {total_steps * self.n_chains}")

    def _get_pooled_samples(self, burnin=0, n_pool=1):
        if self.x is None:
            raise ValueError("No chain data yet.")
        if self.n_chains % n_pool != 0:
            raise ValueError("n_pool must divide n_chains")
        return [
            self.x[i : i + n_pool, burnin:].reshape(-1, self.dim)
            for i in range(0, self.n_chains, n_pool)
        ]

    def plot_chains(self, burnin=None, parameter_indices=None, show_rate=True):
        """Trace plots per dimension, optional acceptance-rate subplot."""
        import matplotlib.pyplot as plt

        if burnin is None:
            burnin = self.burnin_period
        if self.x is None:
            raise ValueError("No chain data.")
        pidx = parameter_indices or list(range(self.dim))
        n_plots = len(pidx)
        total_plots = n_plots + 1 if show_rate else n_plots
        height = min(9, 2.5 * total_plots)
        fig, axes = plt.subplots(total_plots, 1, figsize=(10, height),
                                 sharex=True)
        if total_plots == 1:
            axes = [axes]
        for k, p in enumerate(pidx):
            for c in range(self.n_chains):
                axes[k].plot(self.x[c, : self.global_iter, p], lw=0.5)
            axes[k].axvline(burnin, color="r", linestyle="--")
            axes[k].set_ylabel(f"param {p}")
        if show_rate and self.rates is not None:
            for c in range(self.n_chains):
                axes[-1].plot(self.rates[c], lw=0.5)
            axes[-1].set_ylabel("acc. rate")
            axes[-1].axhline(self.target_acceptance, color="k", linestyle=":")
        axes[-1].set_xlabel("iteration")
        plt.tight_layout()
        plt.show()
        return fig

    def plot_empirical_distributions(self, burnin=None, parameter_indices=None,
                                     bins=40):
        """Per-dimension marginal histograms pooled over chains."""
        import matplotlib.pyplot as plt

        if burnin is None:
            burnin = self.burnin_period
        pidx = parameter_indices or list(range(self.dim))
        fig, axes = plt.subplots(len(pidx), 1,
                                 figsize=(8, min(9, 2.5 * len(pidx))))
        if len(pidx) == 1:
            axes = [axes]
        for k, p in enumerate(pidx):
            data = self.x[:, burnin : self.global_iter, p].reshape(-1)
            axes[k].hist(data, bins=bins, density=True, alpha=0.7)
            axes[k].set_ylabel(f"param {p}")
        plt.tight_layout()
        plt.show()
        return fig
