# gpmp_tpu/mcmc/nuts.py
"""No-U-Turn Sampler (Euclidean metric, diagonal mass), TPU-native.

Reference semantics: /root/reference/gpmp/mcmc/nuts.py:182-1131 --
leapfrog integrator, slice variable log_u = -H0 + log(rand), doubling
tree with multinomial-style proposal selection, divergence flag
DeltaH > delta_max, velocity-based U-turn test, dual-averaging step-size
adaptation with Stan-like windowed diagonal mass adaptation (Welford)
and dual-averaging restarts at window ends.

TPU design: the reference builds the tree by Python recursion and loops
chains serially (nuts.py:500-648, 948-1111).  Here one NUTS transition
is a jitted ``lax.while_loop`` over doublings whose subtrees are built
iteratively with a checkpoint stack of even-leaf states (the
Phan-Pradhan iterative formulation): U-turn checks probe exactly the
subtree boundaries the recursion would check, and the proposal is drawn
by progressive per-leaf replacement, which is distributionally
equivalent to the recursion's pairwise n2/(n1+n2) combination (both
yield a uniform draw among valid states).  Chains advance together via
vmap; warmup adaptation (dual averaging, mass windows) stays host-side
between device calls, as in the reference.
"""

import math
import time
from dataclasses import dataclass, replace
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import gpmp_tpu.num as gnp

_dtype = gnp.get_dtype()

_DEFAULT_NUM_WARMUP = 1000
_DEFAULT_TARGET_ACCEPT = 0.80
_DEFAULT_MAX_DEPTH = 10
_DEFAULT_DELTA_MAX = 1000.0
_DEFAULT_JITTER = 1e-4
_DEFAULT_PROGRESS = True
_DEFAULT_VERBOSE = 1
_DEFAULT_LOG_EVERY = 50


@dataclass
class NUTSOptions:
    """Configuration for NUTS sampling and warmup adaptation."""

    num_warmup: int = _DEFAULT_NUM_WARMUP
    target_accept: float = _DEFAULT_TARGET_ACCEPT
    max_depth: int = _DEFAULT_MAX_DEPTH
    delta_max: float = _DEFAULT_DELTA_MAX
    jitter: float = _DEFAULT_JITTER
    init_step_size: Optional[float] = None
    init_mass_diag: Optional[np.ndarray] = None
    seed: Optional[int] = None
    progress: bool = _DEFAULT_PROGRESS
    verbose: int = _DEFAULT_VERBOSE
    log_every: int = _DEFAULT_LOG_EVERY

    # optional jax.sharding.Mesh: shard the chain axis across devices
    mesh: Optional[Any] = None
    mesh_axis_name: str = "chains"
    # post-warmup sampling as one lax.scan program: True / False / None
    # (None = auto: scan when num_samples >= scan_sampling_threshold --
    # the scan saves one host round-trip per step but costs one extra
    # compilation, which only pays off for long runs)
    scan_sampling: Optional[bool] = None
    scan_sampling_threshold: int = 200
    # warmup in scanned chunks (dual averaging + Welford in-graph,
    # window boundaries host-side): same auto rule
    scan_warmup: Optional[bool] = None
    scan_warmup_threshold: int = 300
    scan_warmup_chunk: int = 200
    # fully fused run: warmup AND sampling as ONE scanned device
    # program over num_warmup + num_samples steps, with per-step flags
    # (adapt / in-mass-window / window-end / freeze) selecting the
    # adaptation behavior in-graph -- mass updates and dual-averaging
    # restarts included.  One compilation and one dispatch for the
    # whole run (the segmented scan_warmup path compiles a separate
    # program per distinct chunk length, which dominates wall-clock on
    # a high-latency device link).  True / False / None (auto: on when
    # checkpoint_path is None and the total step count reaches
    # scan_warmup_threshold).  No intermediate progress output.
    fused: Optional[bool] = None

    # checkpoint/resume of the post-warmup sampling phase (no reference
    # counterpart -- the reference has no checkpointing anywhere,
    # SURVEY.md section 5).  When checkpoint_path is set, sampling runs
    # as chunked scans of checkpoint_every steps over per-step keys
    # pre-split exactly as the single-scan path derives them (so traces
    # are bitwise-identical), snapshotting the full state after each
    # chunk; resume with nuts_resume(log_prob, checkpoint_path).
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 200
    # False: evaluate chains sequentially (lax.map) instead of vmap --
    # required for non-vmappable targets such as mesh-sharded criteria
    vmap_chains: bool = True

    # dual averaging
    dual_averaging_gamma: float = 0.05
    dual_averaging_t0: float = 10.0
    dual_averaging_kappa: float = 0.75
    dual_averaging_mu_factor: float = 10.0

    # warmup window policy
    warmup_min_no_window: int = 20
    warmup_large_threshold: int = 150
    warmup_large_init_buffer: int = 75
    warmup_large_term_buffer: int = 50
    warmup_large_base_window: int = 25
    warmup_init_buffer_ratio: float = 0.15
    warmup_term_buffer_ratio: float = 0.10
    warmup_base_window_divisor: float = 3.0

    # initial step-size search
    find_eps_init: float = 1.0
    find_eps_target_accept: float = 0.5
    find_eps_scale_base: float = 2.0
    find_eps_min: float = 1e-6
    find_eps_max: float = 1e2


def _resolve_nuts_options(options, *, num_warmup, target_accept, max_depth,
                          delta_max, jitter, init_step_size, init_mass_diag,
                          seed, progress, verbose, log_every):
    """Merge rule: explicit non-default kwargs override the options object."""
    opts = replace(options) if options is not None else NUTSOptions()
    if options is None or num_warmup != _DEFAULT_NUM_WARMUP:
        opts.num_warmup = num_warmup
    if options is None or target_accept != _DEFAULT_TARGET_ACCEPT:
        opts.target_accept = target_accept
    if options is None or max_depth != _DEFAULT_MAX_DEPTH:
        opts.max_depth = max_depth
    if options is None or delta_max != _DEFAULT_DELTA_MAX:
        opts.delta_max = delta_max
    if options is None or jitter != _DEFAULT_JITTER:
        opts.jitter = jitter
    if options is None or init_step_size is not None:
        opts.init_step_size = init_step_size
    if options is None or init_mass_diag is not None:
        opts.init_mass_diag = init_mass_diag
    if options is None or seed is not None:
        opts.seed = seed
    if options is None or progress != _DEFAULT_PROGRESS:
        opts.progress = progress
    if options is None or verbose != _DEFAULT_VERBOSE:
        opts.verbose = verbose
    if options is None or log_every != _DEFAULT_LOG_EVERY:
        opts.log_every = log_every
    return opts


class SimpleLogger:
    def __init__(self, verbose=1):
        self.verbose = int(verbose)

    def log(self, msg, level=1):
        if self.verbose >= level:
            print(msg, flush=True)


# ---------------------------
# Adaptation utilities (host-side)
# ---------------------------
@dataclass
class DualAveragingState:
    mu: float
    log_eps: float
    log_eps_bar: float
    h_bar: float
    t: int

    def update(self, accept_stat, target=0.80, gamma=0.05, t0=10.0, kappa=0.75):
        self.t += 1
        eta = 1.0 / (self.t + t0)
        self.h_bar = (1.0 - eta) * self.h_bar + eta * (target - accept_stat)
        self.log_eps = self.mu - (math.sqrt(self.t) / gamma) * self.h_bar
        w = self.t ** (-kappa)
        self.log_eps_bar = w * self.log_eps + (1.0 - w) * self.log_eps_bar
        return math.exp(self.log_eps)

    def final(self):
        return math.exp(self.log_eps_bar)


class RunningDiagVar:
    """Welford online variance (vectorized over a batch of chains)."""

    def __init__(self, dim):
        self.n = 0
        self.mean = np.zeros(dim)
        self.m2 = np.zeros(dim)

    def update_one(self, x):
        self.n += 1
        delta = x - self.mean
        self.mean = self.mean + delta / self.n
        self.m2 = self.m2 + delta * (x - self.mean)

    def update_batch(self, x):
        for i in range(x.shape[0]):
            self.update_one(np.asarray(x[i]))

    def var(self):
        if self.n < 2:
            return np.ones_like(self.mean)
        return self.m2 / (self.n - 1)


def make_warmup_windows(num_warmup, *, min_no_window=20, large_threshold=150,
                        large_init_buffer=75, large_term_buffer=50,
                        large_base_window=25, init_buffer_ratio=0.15,
                        term_buffer_ratio=0.10, base_window_divisor=3.0):
    """Stan-like expanding windows for diagonal mass adaptation."""
    if num_warmup <= min_no_window:
        return []
    if num_warmup >= large_threshold:
        init_buffer = large_init_buffer
        term_buffer = large_term_buffer
        base_window = large_base_window
    else:
        init_buffer = max(1, int(init_buffer_ratio * num_warmup))
        term_buffer = max(1, int(term_buffer_ratio * num_warmup))
        base_window = max(
            1, int((num_warmup - init_buffer - term_buffer) / base_window_divisor)
        )
    start = init_buffer
    end_middle = num_warmup - term_buffer
    if end_middle <= start:
        return []
    win = min(base_window, end_middle - start)
    windows = []
    while start + win < end_middle:
        windows.append((start, start + win))
        start += win
        win = min(2 * win, end_middle - start)
        if win <= 0:
            break
    if start < end_middle:
        windows.append((start, end_middle))
    return windows


def describe_windows(windows):
    if not windows:
        return "no mass adaptation windows"
    return "mass windows: " + " ".join(f"[{a},{b})" for a, b in windows)


# ---------------------------
# Hamiltonian pieces
# ---------------------------
def potential_and_grad(log_prob, q, *, use_helper=True):
    """(U(q), gradU(q)) with U = -log_prob, via autodiff."""
    U, g = jax.value_and_grad(lambda qq: -jnp.asarray(log_prob(qq)).reshape(()))(
        gnp.asarray(q)
    )
    return U, g


def kinetic(p, inv_mass_diag):
    return 0.5 * jnp.sum(p * p * inv_mass_diag)


def leapfrog(log_prob, q, p, gradU, eps, inv_mass_diag):
    """One leapfrog step with step size eps."""
    p_half = p - 0.5 * eps * gradU
    q_new = q + eps * (p_half * inv_mass_diag)
    U_new, g_new = potential_and_grad(log_prob, q_new)
    p_new = p_half - 0.5 * eps * g_new
    return q_new, p_new, U_new, g_new


def is_uturn(q_minus, q_plus, p_minus, p_plus, inv_mass_diag):
    """Velocity-based U-turn test (correct for diagonal M != I)."""
    dq = q_plus - q_minus
    v_minus = inv_mass_diag * p_minus
    v_plus = inv_mass_diag * p_plus
    return (jnp.sum(dq * v_minus) < 0.0) | (jnp.sum(dq * v_plus) < 0.0)


def find_reasonable_step_size(log_prob, q, inv_mass_diag, init_eps=1.0,
                              target_accept=0.5, scale_base=2.0, min_eps=1e-6,
                              max_eps=1e2, key=None, max_iters=None):
    """Doubling/halving search for an initial step size.

    The probe leapfrog is jitted ONCE with eps as a traced argument:
    each doubling step is a dispatch, not a fresh trace of log_prob
    (for an expensive sharded criterion the per-eps retrace dominated
    the whole search -- 373 s in the round-4 multichip dryrun).
    ``max_iters`` bounds the loop on top of the [min_eps, max_eps]
    range; None derives it from that range (+4 slack).
    """
    eps = float(init_eps)
    if key is None:
        key = gnp.next_key()
    mass_diag = 1.0 / inv_mass_diag
    p0 = jax.random.normal(key, q.shape, dtype=q.dtype) * jnp.sqrt(mass_diag)

    U0, g0 = potential_and_grad(log_prob, q)
    H0 = U0 + kinetic(p0, inv_mass_diag)

    @jax.jit
    def _probe(eps_):
        q1, p1, U1, _ = leapfrog(log_prob, q, p0, g0, eps_, inv_mass_diag)
        return U1 + kinetic(p1, inv_mass_diag)

    def alpha_at(eps_):
        la = float(-(_probe(jnp.asarray(eps_)) - H0))
        return math.exp(min(la, 0.0)) if math.isfinite(la) else 0.0

    if max_iters is None:
        span = max(max_eps / max(min_eps, 1e-300), 2.0)
        max_iters = int(math.log(span) / math.log(max(scale_base, 1.001))) + 4

    alpha = alpha_at(eps)
    direction = 1.0 if alpha > target_accept else -1.0
    for _ in range(max_iters):
        eps *= scale_base**direction
        alpha2 = alpha_at(eps)
        if (alpha2 > target_accept and direction < 0) or (
            alpha2 < target_accept and direction > 0
        ):
            break
        if eps < min_eps or eps > max_eps:
            break
    return float(eps)


# ---------------------------
# Iterative tree building (jit)
# ---------------------------
def _ctz(x):
    """Count trailing zeros of a positive int32 (jit-safe)."""
    return lax.population_count((x & -x) - 1)


def _make_transition(log_prob, max_depth):
    """Build the jitted NUTS transition for a fixed static max_depth.

    transition(key, q0, step_size, inv_mass_diag, delta_max) ->
      (q_new, accept_stat, n_leapfrog, depth, divergent)
    """
    pg = lambda q: potential_and_grad(log_prob, q)

    def transition(key, q0, step_size, inv_mass_diag, delta_max):
        dim = q0.shape[0]
        k_mom, k_slice, k_loop = jax.random.split(key, 3)
        mass_diag = 1.0 / inv_mass_diag
        p0 = jax.random.normal(k_mom, (dim,), dtype=q0.dtype) * jnp.sqrt(mass_diag)
        U0, g0 = pg(q0)
        H0 = U0 + kinetic(p0, inv_mass_diag)
        bad_H0 = jnp.isnan(H0) | jnp.isinf(H0)
        log_u = -H0 + jnp.log(
            jnp.maximum(jax.random.uniform(k_slice, dtype=q0.dtype), 1e-300)
        )

        def leaf_step(carry, v):
            """One leapfrog in direction v from the carried edge state."""
            q, p, g = carry
            q1, p1, U1, g1 = leapfrog(log_prob, q, p, g, step_size * v,
                                      inv_mass_diag)
            H1 = U1 + kinetic(p1, inv_mass_diag)
            return (q1, p1, g1), H1

        def build_subtree(key, edge, v, depth):
            """Iteratively add 2^depth leaves from `edge` in direction v.

            Returns (edge_end, q_prop_sub, n_valid_sub, alpha_sum, n_alpha,
            n_leapfrog, completed, divergent).  U-turn sub-checks use a
            checkpoint stack of even-leaf states.
            """
            num_leaves = jnp.asarray(1, jnp.int32) << depth
            q_e, p_e, g_e = edge
            stack_q = jnp.zeros((max_depth + 1, dim), dtype=q_e.dtype)
            stack_p = jnp.zeros((max_depth + 1, dim), dtype=q_e.dtype)

            init = dict(
                key=key,
                i=jnp.asarray(0, jnp.int32),
                q=q_e, p=p_e, g=g_e,
                q_prop=q_e,
                n_valid=jnp.asarray(0, jnp.int32),
                alpha_sum=jnp.asarray(0.0, q_e.dtype),
                n_alpha=jnp.asarray(0, jnp.int32),
                stop=jnp.asarray(False),
                turning=jnp.asarray(False),
                divergent=jnp.asarray(False),
                stack_q=stack_q, stack_p=stack_p,
            )

            def cond(st):
                return (st["i"] < num_leaves) & (~st["stop"])

            def body(st):
                key, k_adopt = jax.random.split(st["key"])
                (q1, p1, g1), H1 = leaf_step((st["q"], st["p"], st["g"]), v)
                bad = jnp.isnan(H1) | jnp.isinf(H1)
                valid = (~bad) & (log_u <= -H1)
                divergent_leaf = bad | ((H1 - H0) > delta_max)
                stop_leaf = divergent_leaf | (log_u >= (delta_max - H1))
                alpha = jnp.where(
                    bad, 0.0, jnp.exp(jnp.minimum(-(H1 - H0), 0.0))
                )

                n_new = st["n_valid"] + valid.astype(jnp.int32)
                adopt_p = jnp.where(
                    valid,
                    1.0 / jnp.maximum(n_new, 1).astype(q1.dtype),
                    0.0,
                )
                adopt = jax.random.uniform(k_adopt, dtype=q1.dtype) < adopt_p
                q_prop = jnp.where(adopt, q1, st["q_prop"])

                i = st["i"]
                even = (i % 2) == 0
                slot = lax.population_count(i)
                stack_q = jnp.where(
                    even, st["stack_q"].at[slot].set(q1), st["stack_q"]
                )
                stack_p = jnp.where(
                    even, st["stack_p"].at[slot].set(p1), st["stack_p"]
                )

                # U-turn checks for every complete subtree ending at odd i
                t_ones = _ctz(i + 1)  # number of trailing ones of i

                def check_j(j, turning):
                    active = (~even) & (j <= t_ones)
                    a = i + 1 - (jnp.asarray(1, jnp.int32) << j)
                    sl = lax.population_count(a)
                    # generation-order endpoints: stored = first state of the
                    # completed subtree, q1 = last.  In the recursion, for
                    # v=+1 (q_minus, q_plus) = (first, last); for v=-1 they
                    # swap, which flips dq -- fold the direction into dq:
                    dqg = v * (q1 - stack_q[sl])
                    ut = (
                        jnp.sum(dqg * (inv_mass_diag * stack_p[sl])) < 0.0
                    ) | (jnp.sum(dqg * (inv_mass_diag * p1)) < 0.0)
                    return turning | (active & ut)

                turning = lax.fori_loop(1, max_depth + 1, check_j,
                                        st["turning"])

                stop = stop_leaf | turning
                return dict(
                    key=key,
                    i=i + 1,
                    q=q1, p=p1, g=g1,
                    q_prop=q_prop,
                    n_valid=n_new,
                    alpha_sum=st["alpha_sum"] + alpha,
                    n_alpha=st["n_alpha"] + 1,
                    stop=stop,
                    turning=turning,
                    divergent=st["divergent"] | divergent_leaf,
                    stack_q=stack_q, stack_p=stack_p,
                )

            st = lax.while_loop(cond, body, init)
            completed = (st["i"] == num_leaves) & (~st["turning"]) & (
                ~st["divergent"]
            )
            return (
                (st["q"], st["p"], st["g"]),
                st["q_prop"],
                st["n_valid"],
                st["alpha_sum"],
                st["n_alpha"],
                st["i"],
                completed,
                st["divergent"],
            )

        outer_init = dict(
            key=k_loop,
            depth=jnp.asarray(0, jnp.int32),
            q_minus=q0, p_minus=p0, g_minus=g0,
            q_plus=q0, p_plus=p0, g_plus=g0,
            q_prop=q0,
            n_valid=jnp.asarray(1, jnp.int32),
            s_cont=~bad_H0,
            alpha_sum=jnp.asarray(0.0, q0.dtype),
            n_alpha=jnp.asarray(0, jnp.int32),
            n_leapfrog=jnp.asarray(0, jnp.int32),
            divergent=bad_H0,
        )

        def outer_cond(st):
            return st["s_cont"] & (st["depth"] < max_depth)

        def outer_body(st):
            key, k_dir, k_sub, k_adopt = jax.random.split(st["key"], 4)
            go_left = jax.random.uniform(k_dir, dtype=q0.dtype) < 0.5
            v = jnp.where(go_left, -1.0, 1.0).astype(q0.dtype)

            edge = (
                jnp.where(go_left, st["q_minus"], st["q_plus"]),
                jnp.where(go_left, st["p_minus"], st["p_plus"]),
                jnp.where(go_left, st["g_minus"], st["g_plus"]),
            )
            (edge_end, q_prop2, n_valid2, alpha2, n_alpha2, nlf2, completed,
             div2) = build_subtree(k_sub, edge, v, st["depth"])

            q_minus = jnp.where(go_left, edge_end[0], st["q_minus"])
            p_minus = jnp.where(go_left, edge_end[1], st["p_minus"])
            g_minus = jnp.where(go_left, edge_end[2], st["g_minus"])
            q_plus = jnp.where(go_left, st["q_plus"], edge_end[0])
            p_plus = jnp.where(go_left, st["p_plus"], edge_end[1])
            g_plus = jnp.where(go_left, st["g_plus"], edge_end[2])

            total = st["n_valid"] + n_valid2
            adopt_p = jnp.where(
                completed & (total > 0),
                n_valid2.astype(q0.dtype) / jnp.maximum(total, 1).astype(q0.dtype),
                0.0,
            )
            adopt = jax.random.uniform(k_adopt, dtype=q0.dtype) < adopt_p
            q_prop = jnp.where(adopt, q_prop2, st["q_prop"])

            s_cont = completed & (
                ~is_uturn(q_minus, q_plus, p_minus, p_plus, inv_mass_diag)
            )
            return dict(
                key=key,
                depth=st["depth"] + 1,
                q_minus=q_minus, p_minus=p_minus, g_minus=g_minus,
                q_plus=q_plus, p_plus=p_plus, g_plus=g_plus,
                q_prop=q_prop,
                n_valid=total,
                s_cont=s_cont,
                alpha_sum=st["alpha_sum"] + alpha2,
                n_alpha=st["n_alpha"] + n_alpha2,
                n_leapfrog=st["n_leapfrog"] + nlf2,
                divergent=st["divergent"] | div2,
            )

        st = lax.while_loop(outer_cond, outer_body, outer_init)
        accept_stat = st["alpha_sum"] / jnp.maximum(st["n_alpha"], 1).astype(
            q0.dtype
        )
        return (st["q_prop"], accept_stat, st["n_leapfrog"], st["depth"],
                st["divergent"])

    return transition


def nuts_transition(log_prob, q0, step_size, inv_mass_diag, max_depth,
                    delta_max, key=None):
    """Single-chain NUTS transition (eager convenience wrapper)."""
    if key is None:
        key = gnp.next_key()
    trans = _make_transition(log_prob, int(max_depth))
    q_new, a, nlf, depth, div = trans(
        key, gnp.asarray(q0), jnp.asarray(step_size),
        gnp.asarray(inv_mass_diag), jnp.asarray(delta_max),
    )
    return q_new, float(a), int(nlf), int(depth), bool(div)


# ---------------------------
# Sampling driver
# ---------------------------
def _batched_transition(transition, vmap_chains):
    """Chain-batched NUTS transition: vmap normally, lax.map when the
    log-prob is not vmappable (e.g. a mesh-sharded criterion from a
    mesh= fit) -- sequential chains are the right semantics there, each
    evaluation already spans all devices."""
    if vmap_chains:
        return jax.vmap(transition, in_axes=(0, 0, None, None, None))

    def seq(keys, q, eps, imd, dmax):
        return lax.map(
            lambda kq: transition(kq[0], kq[1], eps, imd, dmax), (keys, q)
        )

    return seq


def _batched_logprob(log_prob, vmap_chains):
    f = lambda qq: jnp.asarray(log_prob(qq)).reshape(())
    if vmap_chains:
        return jax.vmap(f)
    return lambda qs: lax.map(f, qs)


def nuts_sample(log_prob, q_init, num_samples,
                num_warmup=_DEFAULT_NUM_WARMUP,
                target_accept=_DEFAULT_TARGET_ACCEPT,
                max_depth=_DEFAULT_MAX_DEPTH,
                delta_max=_DEFAULT_DELTA_MAX,
                jitter=_DEFAULT_JITTER,
                init_step_size=None, init_mass_diag=None, seed=None,
                progress=_DEFAULT_PROGRESS, verbose=_DEFAULT_VERBOSE,
                log_every=_DEFAULT_LOG_EVERY,
                options: Optional[NUTSOptions] = None):
    """NUTS with warmup; q_init (chains, dim); returns
    (samples (num_samples, chains, dim), info dict of traces)."""
    q_init = gnp.asarray(q_init)
    if q_init.ndim != 2:
        raise ValueError("q_init must have shape (chains, dim)")

    opts = _resolve_nuts_options(
        options, num_warmup=num_warmup, target_accept=target_accept,
        max_depth=max_depth, delta_max=delta_max, jitter=jitter,
        init_step_size=init_step_size, init_mass_diag=init_mass_diag,
        seed=seed, progress=progress, verbose=verbose, log_every=log_every,
    )
    num_warmup = int(opts.num_warmup)
    target_accept = float(opts.target_accept)
    max_depth = int(opts.max_depth)
    delta_max = float(opts.delta_max)
    jitter = float(opts.jitter)
    logger = SimpleLogger(verbose=int(opts.verbose))
    log_every = int(opts.log_every)

    chains, dim = q_init.shape
    eps_min = float(opts.find_eps_min)
    eps_max = float(opts.find_eps_max)
    if not math.isfinite(eps_min) or eps_min <= 0.0:
        eps_min = 1e-12
    if not math.isfinite(eps_max) or eps_max <= eps_min:
        eps_max = max(1.0, 10.0 * eps_min)

    def _clamp(eps):
        eps = float(eps)
        if not math.isfinite(eps) or eps <= 0.0:
            return eps_min
        return min(max(eps, eps_min), eps_max)

    logger.log(f"chains={chains}, dim={dim}")
    logger.log(f"num_warmup={num_warmup}, num_samples={num_samples}")
    logger.log(
        f"target_accept={target_accept}, max_depth={max_depth}, "
        f"delta_max={delta_max}"
    )

    master_key = jax.random.PRNGKey(
        opts.seed if opts.seed is not None
        else int(np.random.default_rng().integers(2**31))
    )
    if opts.seed is not None:
        logger.log(f"seed={opts.seed}")

    if opts.init_mass_diag is None:
        mass_diag = np.ones(dim)
        logger.log("mass_diag init: identity (ones)")
    else:
        imd = np.asarray(opts.init_mass_diag)
        if imd.shape != (dim,):
            raise ValueError("init_mass_diag must have shape (dim,)")
        mass_diag = np.clip(imd, jitter, None)
        logger.log("mass_diag init: provided (clamped)")
    inv_mass_diag = 1.0 / mass_diag

    # jitted transition, vmapped over chains
    transition = _make_transition(log_prob, max_depth)
    vmap_chains = bool(opts.vmap_chains)
    vtrans = jax.jit(_batched_transition(transition, vmap_chains))
    vlogprob = jax.jit(_batched_logprob(log_prob, vmap_chains))
    if opts.mesh is not None:
        # shard the chain axis: each device runs chains/n_devices NUTS
        # transitions locally (no reference counterpart, SURVEY.md 2.7)
        from jax.sharding import NamedSharding, PartitionSpec

        _ndev = opts.mesh.shape[opts.mesh_axis_name]
        if chains % _ndev != 0:
            raise ValueError(
                f"number of chains ({chains}) must be divisible by the "
                f"mesh axis size ({_ndev})"
            )
        _cs = NamedSharding(opts.mesh, PartitionSpec(opts.mesh_axis_name))
        q_init = jax.device_put(q_init, _cs)

    if opts.init_step_size is None:
        t0 = time.time()
        master_key, sub = jax.random.split(master_key)
        eps0 = find_reasonable_step_size(
            log_prob, q_init[0], jnp.asarray(inv_mass_diag),
            init_eps=opts.find_eps_init,
            target_accept=opts.find_eps_target_accept,
            scale_base=opts.find_eps_scale_base,
            min_eps=opts.find_eps_min, max_eps=opts.find_eps_max, key=sub,
        )
        logger.log(
            f"initial step size heuristic: eps0={eps0:.6g} "
            f"(took {time.time() - t0:.2f}s)"
        )
    else:
        eps0 = float(opts.init_step_size)
        logger.log(f"initial step size: provided eps0={eps0:.6g}")
    eps0 = _clamp(eps0)
    mu0 = max(eps_min, float(opts.dual_averaging_mu_factor) * eps0)

    da = DualAveragingState(mu=math.log(mu0), log_eps=math.log(eps0),
                            log_eps_bar=math.log(eps0), h_bar=0.0, t=0)
    step_size = eps0

    windows = make_warmup_windows(
        num_warmup,
        min_no_window=opts.warmup_min_no_window,
        large_threshold=opts.warmup_large_threshold,
        large_init_buffer=opts.warmup_large_init_buffer,
        large_term_buffer=opts.warmup_large_term_buffer,
        large_base_window=opts.warmup_large_base_window,
        init_buffer_ratio=opts.warmup_init_buffer_ratio,
        term_buffer_ratio=opts.warmup_term_buffer_ratio,
        base_window_divisor=opts.warmup_base_window_divisor,
    )
    window_end_set = {end for _s, end in windows}
    logger.log(describe_windows(windows))
    rv = RunningDiagVar(dim)

    q = jnp.asarray(q_init)

    warmup_accept = np.empty((num_warmup, chains))
    warmup_div = np.empty((num_warmup, chains), dtype=bool)
    warmup_depth = np.empty((num_warmup, chains), dtype=int)
    warmup_nlf = np.empty((num_warmup, chains), dtype=int)
    warmup_log_target = np.empty((num_warmup, chains))
    warmup_eps = np.empty(num_warmup)

    logger.log("warmup: start")
    t_warm0 = time.time()

    use_fused = opts.fused
    if use_fused is None:
        use_fused = opts.checkpoint_path is None and (
            num_warmup + num_samples >= int(opts.scan_warmup_threshold)
        )
    use_fused = bool(use_fused) and opts.checkpoint_path is None

    samples = accept = divergent = tree_depth = None
    n_leapfrog = log_target = None
    if use_fused:
        # warmup AND sampling as ONE scanned program: per-step flags
        # select adaptation behavior in-graph (exact mirrors of
        # DualAveragingState.update, RunningDiagVar.update_batch, the
        # window-end mass update / dual-averaging restart, and the
        # end-of-warmup freeze to exp(log_eps_bar)).  One compilation,
        # one dispatch for the entire run.
        T = num_warmup + num_samples
        logger.log(
            f"fused mode: warmup+sampling as one scanned program "
            f"({T} steps, single dispatch)"
        )
        g_da = float(opts.dual_averaging_gamma)
        t0_da = float(opts.dual_averaging_t0)
        kap_da = float(opts.dual_averaging_kappa)
        muf_da = float(opts.dual_averaging_mu_factor)

        flags = np.zeros((T, 4))
        flags[:num_warmup, 0] = 1.0                       # adapt (DA)
        for _ws, _we in windows:                          # in mass window
            flags[_ws:min(_we, num_warmup), 1] = 1.0
        for _we in window_end_set:                        # window end
            if 0 < _we <= num_warmup:
                flags[_we - 1, 2] = 1.0
        if num_samples > 0 and num_warmup > 0:
            flags[num_warmup, 3] = 1.0                    # freeze eps

        @jax.jit
        def _fused(keys, flags, carry0, dmax):
            def body(carry, xs):
                (qc, mu, log_eps, log_eps_bar, h_bar, tda,
                 wn, wmean, wm2, mass) = carry
                keys_t, fl = xs
                adapt, in_w, wend, freeze = fl[0], fl[1], fl[2], fl[3]

                # end-of-warmup freeze: eps <- _clamp(exp(log_eps_bar))
                ebar = jnp.exp(log_eps_bar)
                ebar = jnp.where(
                    jnp.isfinite(ebar) & (ebar > 0.0),
                    jnp.clip(ebar, eps_min, eps_max), eps_min,
                )
                log_eps = jnp.where(freeze > 0.5, jnp.log(ebar), log_eps)

                eps = jnp.clip(jnp.exp(log_eps), eps_min, eps_max)
                imd = 1.0 / mass
                q1, a, nlf, depth, div = _batched_transition(
                    transition, vmap_chains
                )(keys_t, qc, eps, imd, dmax)
                lp = _batched_logprob(log_prob, vmap_chains)(q1)

                # dual averaging update (gated by adapt)
                mean_accept = jnp.mean(a)
                tda1 = tda + 1.0
                eta = 1.0 / (tda1 + t0_da)
                h_bar1 = (1.0 - eta) * h_bar + eta * (
                    target_accept - mean_accept
                )
                log_eps1 = mu - (jnp.sqrt(tda1) / g_da) * h_bar1
                w = tda1 ** (-kap_da)
                log_eps_bar1 = w * log_eps1 + (1.0 - w) * log_eps_bar
                tda = jnp.where(adapt > 0.5, tda1, tda)
                h_bar = jnp.where(adapt > 0.5, h_bar1, h_bar)
                log_eps = jnp.where(adapt > 0.5, log_eps1, log_eps)
                log_eps_bar = jnp.where(
                    adapt > 0.5, log_eps_bar1, log_eps_bar
                )

                # Welford over chains, sequential (gated by in_w)
                def wf(i, s):
                    n, m, m2 = s
                    n1 = n + 1.0
                    delta = q1[i] - m
                    m1 = m + delta / n1
                    return n1, m1, m2 + delta * (q1[i] - m1)

                wn1, wmean1, wm21 = lax.fori_loop(
                    0, q1.shape[0], wf, (wn, wmean, wm2)
                )
                wn = jnp.where(in_w > 0.5, wn1, wn)
                wmean = jnp.where(in_w > 0.5, wmean1, wmean)
                wm2 = jnp.where(in_w > 0.5, wm21, wm2)

                # window end: mass update + Welford reset + DA restart
                var = jnp.where(
                    wn >= 2.0, wm2 / jnp.maximum(wn - 1.0, 1.0),
                    jnp.ones_like(wm2),
                )
                mass_new = jnp.clip(var, jitter, None)
                enow = jnp.exp(log_eps)
                enow = jnp.where(
                    jnp.isfinite(enow) & (enow > 0.0),
                    jnp.clip(enow, eps_min, eps_max), eps_min,
                )
                mass = jnp.where(wend > 0.5, mass_new, mass)
                mu = jnp.where(
                    wend > 0.5,
                    jnp.log(jnp.maximum(eps_min, muf_da * enow)), mu,
                )
                log_eps = jnp.where(wend > 0.5, jnp.log(enow), log_eps)
                log_eps_bar = jnp.where(
                    wend > 0.5, jnp.log(enow), log_eps_bar
                )
                h_bar = jnp.where(wend > 0.5, 0.0, h_bar)
                tda = jnp.where(wend > 0.5, 0.0, tda)
                wn = jnp.where(wend > 0.5, 0.0, wn)
                wmean = jnp.where(
                    wend > 0.5, jnp.zeros_like(wmean), wmean
                )
                wm2 = jnp.where(wend > 0.5, jnp.zeros_like(wm2), wm2)

                carry = (q1, mu, log_eps, log_eps_bar, h_bar, tda,
                         wn, wmean, wm2, mass)
                return carry, (q1, a, nlf, depth, div, lp, eps)

            return lax.scan(body, carry0, (keys, flags))

        master_key, sub = jax.random.split(master_key)
        keys = jax.random.split(sub, T * chains).reshape(T, chains, 2)
        carry0 = (
            q, jnp.asarray(da.mu), jnp.asarray(da.log_eps),
            jnp.asarray(da.log_eps_bar), jnp.asarray(da.h_bar),
            jnp.asarray(float(da.t)), jnp.asarray(0.0),
            jnp.zeros(dim), jnp.zeros(dim), jnp.asarray(mass_diag),
        )
        carry, (qs_f, a_f, nlf_f, depth_f, div_f, lp_f, eps_f) = _fused(
            jnp.asarray(keys), jnp.asarray(flags), carry0,
            jnp.asarray(delta_max),
        )
        q = carry[0]
        da.mu = float(carry[1])
        da.log_eps = float(carry[2])
        da.log_eps_bar = float(carry[3])
        da.h_bar = float(carry[4])
        da.t = int(carry[5])
        mass_diag = np.asarray(carry[9])
        inv_mass_diag = 1.0 / mass_diag
        step_size = _clamp(math.exp(da.log_eps))

        a_np, div_np = np.asarray(a_f), np.asarray(div_f)
        depth_np, nlf_np = np.asarray(depth_f), np.asarray(nlf_f)
        lp_np, eps_np = np.asarray(lp_f), np.asarray(eps_f)
        warmup_accept[:] = a_np[:num_warmup]
        warmup_div[:] = div_np[:num_warmup]
        warmup_depth[:] = depth_np[:num_warmup]
        warmup_nlf[:] = nlf_np[:num_warmup]
        warmup_log_target[:] = lp_np[:num_warmup]
        warmup_eps[:] = eps_np[:num_warmup]
        samples = np.asarray(qs_f)[num_warmup:]
        accept = a_np[num_warmup:]
        divergent = div_np[num_warmup:]
        tree_depth = depth_np[num_warmup:].astype(int)
        n_leapfrog = nlf_np[num_warmup:].astype(int)
        log_target = lp_np[num_warmup:]

    use_scan_warmup = opts.scan_warmup
    if use_scan_warmup is None:
        use_scan_warmup = num_warmup >= int(opts.scan_warmup_threshold)
    use_scan_warmup = use_scan_warmup and not use_fused

    if use_scan_warmup:
        # in-graph exact mirrors of DualAveragingState.update and the
        # sequential-over-chains Welford update; chunks are cut at mass
        # window boundaries so the in-window flag is static per chunk,
        # and capped at scan_warmup_chunk steps per dispatch
        def _warmup_chunk_fn(in_window):
            g = float(opts.dual_averaging_gamma)
            t0c = float(opts.dual_averaging_t0)
            kap = float(opts.dual_averaging_kappa)

            @jax.jit
            def chunk(q0, keys, mu, da_state, w_state, imd, dmax):
                def body(carry, keys_t):
                    q, log_eps, log_eps_bar, h_bar, tda, wn, wmean, wm2 = carry
                    eps = jnp.clip(jnp.exp(log_eps), eps_min, eps_max)
                    q1, a, nlf, depth, div = _batched_transition(
                        transition, vmap_chains
                    )(keys_t, q, eps, imd, dmax)
                    lp = _batched_logprob(log_prob, vmap_chains)(q1)
                    mean_accept = jnp.mean(a)
                    tda = tda + 1.0
                    eta = 1.0 / (tda + t0c)
                    h_bar = (1.0 - eta) * h_bar + eta * (
                        target_accept - mean_accept
                    )
                    log_eps = mu - (jnp.sqrt(tda) / g) * h_bar
                    w = tda ** (-kap)
                    log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
                    if in_window:
                        def wf(i, s):
                            n, m, m2 = s
                            n = n + 1.0
                            delta = q1[i] - m
                            m = m + delta / n
                            m2 = m2 + delta * (q1[i] - m)
                            return n, m, m2

                        wn, wmean, wm2 = lax.fori_loop(
                            0, q1.shape[0], wf, (wn, wmean, wm2)
                        )
                    carry = (q1, log_eps, log_eps_bar, h_bar, tda, wn,
                             wmean, wm2)
                    return carry, (a, nlf, depth, div, lp, eps)

                carry0 = (q0,) + da_state + w_state
                carry, out = lax.scan(body, carry0, keys)
                return carry, out

            return chunk

        _warmup_chunks = {
            True: _warmup_chunk_fn(True), False: _warmup_chunk_fn(False)
        }
        # segment [0, num_warmup) at window starts/ends, cap chunk length
        cuts = {0, num_warmup}
        for s, e in windows:
            cuts.add(min(s, num_warmup))
            cuts.add(min(e, num_warmup))
        cuts = sorted(cuts)
        segments = []
        cap = max(1, int(opts.scan_warmup_chunk))
        for a0, b0 in zip(cuts[:-1], cuts[1:]):
            t = a0
            while t < b0:
                segments.append((t, min(t + cap, b0)))
                t = min(t + cap, b0)

        for (seg_a, seg_b) in segments:
            L = seg_b - seg_a
            in_window = any(s <= seg_a < e for s, e in windows)
            master_key, sub = jax.random.split(master_key)
            keys = jax.random.split(sub, L * chains).reshape(L, chains, 2)
            da_state = (jnp.asarray(da.log_eps), jnp.asarray(da.log_eps_bar),
                        jnp.asarray(da.h_bar), jnp.asarray(float(da.t)))
            w_state = (jnp.asarray(float(rv.n)), jnp.asarray(rv.mean),
                       jnp.asarray(rv.m2))
            carry, (a_s, nlf_s, depth_s, div_s, lp_s, eps_s) = (
                _warmup_chunks[in_window](
                    q, keys, jnp.asarray(da.mu), da_state, w_state,
                    jnp.asarray(inv_mass_diag), jnp.asarray(delta_max),
                )
            )
            (q, log_eps, log_eps_bar, h_bar, tda, wn, wmean, wm2) = carry
            da.log_eps = float(log_eps)
            da.log_eps_bar = float(log_eps_bar)
            da.h_bar = float(h_bar)
            da.t = int(tda)
            rv.n = int(wn)
            rv.mean = np.asarray(wmean)
            rv.m2 = np.asarray(wm2)
            step_size = _clamp(math.exp(da.log_eps))
            warmup_accept[seg_a:seg_b] = np.asarray(a_s)
            warmup_div[seg_a:seg_b] = np.asarray(div_s)
            warmup_depth[seg_a:seg_b] = np.asarray(depth_s)
            warmup_nlf[seg_a:seg_b] = np.asarray(nlf_s)
            warmup_log_target[seg_a:seg_b] = np.asarray(lp_s)
            warmup_eps[seg_a:seg_b] = np.asarray(eps_s)
            if seg_b in window_end_set:
                old_mean = float(np.mean(mass_diag))
                mass_diag = np.clip(rv.var(), jitter, None)
                inv_mass_diag = 1.0 / mass_diag
                logger.log(
                    f"warmup iter {seg_b}: mass update at window end; "
                    f"mean(mass_diag) {old_mean:.6g} -> "
                    f"{float(np.mean(mass_diag)):.6g}"
                )
                rv = RunningDiagVar(dim)
                mu_ref = max(
                    eps_min,
                    float(opts.dual_averaging_mu_factor) * step_size,
                )
                da = DualAveragingState(
                    mu=math.log(mu_ref), log_eps=math.log(step_size),
                    log_eps_bar=math.log(step_size), h_bar=0.0, t=0,
                )
                logger.log(
                    f"warmup iter {seg_b}: dual averaging restart; "
                    f"eps={step_size:.6g}"
                )
            logger.log(
                f"warmup chunk [{seg_a}, {seg_b}): eps={step_size:.6g}, "
                f"mean_accept="
                f"{float(np.mean(warmup_accept[seg_a:seg_b])):.3f}"
            )
    num_warmup_loop = 0 if (use_scan_warmup or use_fused) else num_warmup

    for t in range(num_warmup_loop):
        master_key, sub = jax.random.split(master_key)
        chain_keys = jax.random.split(sub, chains)
        q, a, nlf, depth, div = vtrans(
            chain_keys, q, jnp.asarray(step_size), jnp.asarray(inv_mass_diag),
            jnp.asarray(delta_max),
        )
        warmup_accept[t] = np.asarray(a)
        warmup_div[t] = np.asarray(div)
        warmup_depth[t] = np.asarray(depth)
        warmup_nlf[t] = np.asarray(nlf)
        warmup_log_target[t] = np.asarray(vlogprob(q))
        warmup_eps[t] = step_size

        mean_accept = float(np.mean(warmup_accept[t]))
        mean_div = float(np.mean(warmup_div[t]))

        step_size = _clamp(
            da.update(
                mean_accept, target=target_accept,
                gamma=opts.dual_averaging_gamma, t0=opts.dual_averaging_t0,
                kappa=opts.dual_averaging_kappa,
            )
        )

        in_mass_window = any(start <= t < end for start, end in windows)
        if in_mass_window:
            rv.update_batch(np.asarray(q))

        if (t + 1) in window_end_set:
            old_mean = float(np.mean(mass_diag))
            mass_diag = np.clip(rv.var(), jitter, None)
            inv_mass_diag = 1.0 / mass_diag
            logger.log(
                f"warmup iter {t + 1}: mass update at window end; "
                f"mean(mass_diag) {old_mean:.6g} -> "
                f"{float(np.mean(mass_diag)):.6g}"
            )
            rv = RunningDiagVar(dim)
            mu_ref = max(eps_min, float(opts.dual_averaging_mu_factor) * step_size)
            da = DualAveragingState(
                mu=math.log(mu_ref), log_eps=math.log(step_size),
                log_eps_bar=math.log(step_size), h_bar=0.0, t=0,
            )
            logger.log(
                f"warmup iter {t + 1}: dual averaging restart; "
                f"eps={step_size:.6g}"
            )

        do_log = ((t + 1) % max(1, log_every) == 0) or t == 0 or (
            t + 1 == num_warmup
        )
        if int(opts.verbose) >= 2:
            do_log = ((t + 1) % max(1, log_every // 5) == 0) or do_log
        if do_log:
            logger.log(
                f"warmup iter {t + 1}/{num_warmup}: eps={step_size:.6g}, "
                f"mean_accept={mean_accept:.3f}, div_rate={mean_div:.3f}"
            )

    warmup_time = time.time() - t_warm0
    step_size_final = _clamp(da.final())
    step_size = step_size_final
    logger.log(f"warmup: done in {warmup_time:.2f}s")
    logger.log(f"warmup: step_size_final={step_size_final:.6g}")
    logger.log(f"warmup: mass_diag_final mean={float(np.mean(mass_diag)):.6g}")

    if not use_fused:
        samples = np.empty((num_samples, chains, dim))
        accept = np.empty((num_samples, chains))
        divergent = np.empty((num_samples, chains), dtype=bool)
        tree_depth = np.empty((num_samples, chains), dtype=int)
        n_leapfrog = np.empty((num_samples, chains), dtype=int)
        log_target = np.empty((num_samples, chains))

    logger.log("sample: start")
    t_samp0 = time.time()
    use_scan = opts.scan_sampling
    if use_scan is None:
        use_scan = num_samples >= int(opts.scan_sampling_threshold)
    if use_fused:
        pass  # samples already produced by the fused scan above
    elif opts.checkpoint_path is not None:
        # chunked scans over per-step keys pre-split exactly like the
        # single-scan path -> bitwise-identical traces, snapshot after
        # every chunk; resume with nuts_resume()
        master_key, sub = jax.random.split(master_key)
        sub_np = np.asarray(sub)
        step_keys = jax.random.split(sub, num_samples * chains).reshape(
            num_samples, chains, 2
        )
        traces = {
            "samples": samples, "accept": accept, "divergent": divergent,
            "tree_depth": tree_depth, "n_leapfrog": n_leapfrog,
            "log_target": log_target,
        }
        warmup_arrays = {
            "warmup_eps": warmup_eps, "warmup_accept": warmup_accept,
            "warmup_div": warmup_div, "warmup_depth": warmup_depth,
            "warmup_nlf": warmup_nlf, "warmup_log_target": warmup_log_target,
        }
        meta_common = {
            "kind": "NUTS", "num_samples": int(num_samples),
            "chains": int(chains), "dim": int(dim),
            "max_depth": int(max_depth), "delta_max": float(delta_max),
            "step_size": float(step_size),
            "step_size_final": float(step_size_final),
            "vmap_chains": vmap_chains,
            "checkpoint_every": int(opts.checkpoint_every),
        }
        q = _run_sampling_chunks(
            transition, log_prob, q, step_keys, 0, traces,
            step_size, inv_mass_diag, delta_max,
            max(1, int(opts.checkpoint_every)),
            _make_nuts_saver(opts.checkpoint_path, sub_np, mass_diag,
                             traces, warmup_arrays, meta_common),
            vmap_chains=vmap_chains,
        )
    elif use_scan:
        # post-warmup phase: eps and mass are frozen, so the whole
        # sampling run is one scanned device program (one dispatch
        # instead of num_samples host round-trips -- the reference loops
        # in Python, nuts.py:1045-1111).  Costs one extra compilation,
        # hence the threshold.
        master_key, sub = jax.random.split(master_key)
        step_keys = jax.random.split(sub, num_samples * chains).reshape(
            num_samples, chains, 2
        )

        @jax.jit
        def _sample_scan(q0, keys, eps, imd, dmax):
            def body(q, keys_t):
                q1, a, nlf, depth, div = _batched_transition(
                    transition, vmap_chains
                )(keys_t, q, eps, imd, dmax)
                lp = _batched_logprob(log_prob, vmap_chains)(q1)
                return q1, (q1, a, nlf, depth, div, lp)

            return lax.scan(body, q0, keys)

        q, (qs, a_s, nlf_s, depth_s, div_s, lp_s) = _sample_scan(
            q, step_keys, jnp.asarray(step_size),
            jnp.asarray(inv_mass_diag), jnp.asarray(delta_max),
        )
        samples[:] = np.asarray(qs)
        accept[:] = np.asarray(a_s)
        divergent[:] = np.asarray(div_s)
        tree_depth[:] = np.asarray(depth_s)
        n_leapfrog[:] = np.asarray(nlf_s)
        log_target[:] = np.asarray(lp_s)
    else:
        for t in range(num_samples):
            master_key, sub = jax.random.split(master_key)
            chain_keys = jax.random.split(sub, chains)
            q, a, nlf, depth, div = vtrans(
                chain_keys, q, jnp.asarray(step_size),
                jnp.asarray(inv_mass_diag), jnp.asarray(delta_max),
            )
            samples[t] = np.asarray(q)
            accept[t] = np.asarray(a)
            divergent[t] = np.asarray(div)
            tree_depth[t] = np.asarray(depth)
            n_leapfrog[t] = np.asarray(nlf)
            log_target[t] = np.asarray(vlogprob(q))
    logger.log(
        f"sample: mean_accept={float(np.mean(accept)):.3f}, "
        f"div_rate={float(np.mean(divergent)):.3f}"
    )
    logger.log(f"sample: done in {time.time() - t_samp0:.2f}s")

    info = {
        "warmup_step_size": warmup_eps,
        "warmup_accept_stat": warmup_accept,
        "warmup_divergent": warmup_div,
        "warmup_tree_depth": warmup_depth,
        "warmup_log_prob_trace": warmup_log_target,
        "warmup_n_leapfrog": warmup_nlf,
        "accept_stat": accept,
        "divergent": divergent,
        "tree_depth": tree_depth,
        "n_leapfrog": n_leapfrog,
        "log_prob_trace": log_target,
        "step_size_final": step_size_final,
        "mass_diag_final": mass_diag.copy(),
    }
    return gnp.asarray(samples), info


# ---------------------------
# checkpoint / resume (no reference counterpart; SURVEY.md section 5)
# ---------------------------
def _run_sampling_chunks(transition, log_prob, q, step_keys, t_start,
                         traces, step_size, inv_mass_diag, delta_max,
                         chunk, save_fn, vmap_chains=True):
    """Advance the frozen-parameter sampling phase in scanned chunks,
    filling ``traces`` in place and calling ``save_fn(q, t_done)`` after
    each chunk.  Per-step keys come pre-split, so chunking does not
    change the sample stream."""
    num_samples = step_keys.shape[0]

    @jax.jit
    def _chunk_scan(q0, keys, eps, imd, dmax):
        def body(qc, keys_t):
            q1, a, nlf, depth, div = _batched_transition(
                transition, vmap_chains
            )(keys_t, qc, eps, imd, dmax)
            lp = _batched_logprob(log_prob, vmap_chains)(q1)
            return q1, (q1, a, nlf, depth, div, lp)

        return lax.scan(body, q0, keys)

    t = int(t_start)
    while t < num_samples:
        k = min(chunk, num_samples - t)
        q, (qs, a_s, nlf_s, depth_s, div_s, lp_s) = _chunk_scan(
            q, jnp.asarray(step_keys[t : t + k]), jnp.asarray(step_size),
            jnp.asarray(inv_mass_diag), jnp.asarray(delta_max),
        )
        traces["samples"][t : t + k] = np.asarray(qs)
        traces["accept"][t : t + k] = np.asarray(a_s)
        traces["divergent"][t : t + k] = np.asarray(div_s)
        traces["tree_depth"][t : t + k] = np.asarray(depth_s)
        traces["n_leapfrog"][t : t + k] = np.asarray(nlf_s)
        traces["log_target"][t : t + k] = np.asarray(lp_s)
        t += k
        save_fn(q, t)
    return q


def _make_nuts_saver(path, sub_np, mass_diag, traces, warmup_arrays,
                     meta_common):
    def save_fn(q, t_done):
        from .checkpoint import save_sampler_checkpoint

        arrays = {"q": np.asarray(q), "mass_diag": np.asarray(mass_diag),
                  "sub": sub_np}
        arrays.update({f"trace_{k}": v for k, v in traces.items()})
        arrays.update(warmup_arrays)
        meta = dict(meta_common)
        meta["t_done"] = int(t_done)
        save_sampler_checkpoint(path, arrays, meta)

    return save_fn


def nuts_resume(log_prob, checkpoint_path, verbose=1):
    """Resume an interrupted nuts_sample run whose options set
    checkpoint_path; returns the same (samples, info) the uninterrupted
    run would have (bitwise-identical traces).  The caller re-supplies
    the log-probability function; everything else is in the snapshot."""
    from .checkpoint import load_sampler_checkpoint

    arrays, meta = load_sampler_checkpoint(checkpoint_path)
    if meta.get("kind") != "NUTS":
        raise ValueError(f"Not a NUTS checkpoint: {meta.get('kind')!r}")
    logger = SimpleLogger(verbose=verbose)
    num_samples = meta["num_samples"]
    chains, dim = meta["chains"], meta["dim"]
    t_done = meta["t_done"]
    step_size = meta["step_size"]
    delta_max = meta["delta_max"]
    mass_diag = np.asarray(arrays["mass_diag"])
    inv_mass_diag = 1.0 / mass_diag
    q = jnp.asarray(arrays["q"])

    traces = {
        "samples": np.array(arrays["trace_samples"]),
        "accept": np.array(arrays["trace_accept"]),
        "divergent": np.array(arrays["trace_divergent"]),
        "tree_depth": np.array(arrays["trace_tree_depth"]),
        "n_leapfrog": np.array(arrays["trace_n_leapfrog"]),
        "log_target": np.array(arrays["trace_log_target"]),
    }
    logger.log(
        f"nuts_resume: {t_done}/{num_samples} samples done, continuing"
    )
    transition = _make_transition(log_prob, meta["max_depth"])
    sub = jnp.asarray(arrays["sub"])
    step_keys = jax.random.split(sub, num_samples * chains).reshape(
        num_samples, chains, 2
    )
    warmup_arrays = {
        k: np.array(arrays[k])
        for k in ("warmup_eps", "warmup_accept", "warmup_div",
                  "warmup_depth", "warmup_nlf", "warmup_log_target")
    }
    meta_common = {k: meta[k] for k in ("kind", "num_samples", "chains",
                                        "dim", "max_depth", "delta_max",
                                        "step_size", "step_size_final")}
    meta_common["vmap_chains"] = bool(meta.get("vmap_chains", True))
    # honor the original run's checkpoint cadence (older checkpoints
    # without the field fall back to ~10% chunks)
    ckpt_every = int(meta.get(
        "checkpoint_every",
        num_samples // 10 if num_samples >= 10 else num_samples,
    ))
    meta_common["checkpoint_every"] = ckpt_every
    _run_sampling_chunks(
        transition, log_prob, q, step_keys, t_done, traces,
        step_size, inv_mass_diag, delta_max,
        max(1, ckpt_every),
        _make_nuts_saver(checkpoint_path, np.asarray(arrays["sub"]),
                         mass_diag, traces, warmup_arrays, meta_common),
        vmap_chains=bool(meta.get("vmap_chains", True)),
    )
    info = {
        "warmup_step_size": warmup_arrays["warmup_eps"],
        "warmup_accept_stat": warmup_arrays["warmup_accept"],
        "warmup_divergent": warmup_arrays["warmup_div"],
        "warmup_tree_depth": warmup_arrays["warmup_depth"],
        "warmup_log_prob_trace": warmup_arrays["warmup_log_target"],
        "warmup_n_leapfrog": warmup_arrays["warmup_nlf"],
        "accept_stat": traces["accept"],
        "divergent": traces["divergent"],
        "tree_depth": traces["tree_depth"],
        "n_leapfrog": traces["n_leapfrog"],
        "log_prob_trace": traces["log_target"],
        "step_size_final": meta["step_size_final"],
        "mass_diag_final": mass_diag.copy(),
    }
    return gnp.asarray(traces["samples"]), info


# ---------------------------
# Diagnostics plots
# ---------------------------
def moving_average(y, window: int):
    """Valid-mode moving average."""
    y = np.asarray(y, dtype=float)
    w = np.ones(int(window)) / float(window)
    return np.convolve(y, w, mode="valid")


def plot_nuts_diagnostics(samples, info, burnin=0, parameter_indices=None,
                          ma_window=25):
    """Trace plots + accept/divergence/step-size diagnostics."""
    import matplotlib.pyplot as plt

    samples = np.asarray(samples)
    num_samples, chains, dim = samples.shape
    pidx = parameter_indices or list(range(dim))
    n_rows = len(pidx) + 3
    fig, axes = plt.subplots(n_rows, 1, figsize=(10, min(12, 2.2 * n_rows)),
                             sharex=False)
    for k, pi in enumerate(pidx):
        for c in range(chains):
            axes[k].plot(samples[burnin:, c, pi], lw=0.5)
        axes[k].set_ylabel(f"param {pi}")
    acc = np.asarray(info["accept_stat"]).mean(axis=1)
    axes[-3].plot(acc, lw=0.5)
    if len(acc) >= ma_window:
        axes[-3].plot(
            np.arange(ma_window - 1, len(acc)), moving_average(acc, ma_window)
        )
    axes[-3].set_ylabel("accept")
    axes[-2].plot(np.asarray(info["divergent"]).mean(axis=1), lw=0.5)
    axes[-2].set_ylabel("divergence")
    axes[-1].plot(np.asarray(info["warmup_step_size"]), lw=0.8)
    axes[-1].set_ylabel("warmup eps")
    axes[-1].set_xlabel("iteration")
    plt.tight_layout()
    plt.show()
    return fig
