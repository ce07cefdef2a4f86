# gpmp_tpu/mcmc/svgd.py
"""Annealed Stein variational gradient descent, TPU-native.

Reference semantics: /root/reference/gpmp/mcmc/svgd.py:40-526 (RBF kernel
with median-heuristic bandwidth / log(n+1), per-particle tempered scores
with dead-particle masking, kernel-weighted transport + 2/h repulsion,
diagonal preconditioner, box projection, linear/geometric temperature
schedule).

TPU design: the reference evaluates value_and_grad particle by particle
in a Python loop (svgd.py:310-313); here the particle loop is a vmap and
the step loop is a single jitted ``lax.scan`` over a precomputed
temperature schedule -- the entire annealed run is one device program.
The median heuristic uses the off-diagonal median (nanmedian over a
masked matrix), a static-shape formulation of the reference's
positive-distance median.
"""

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import gpmp_tpu.num as gnp
from gpmp_tpu.misc.designs import randunif

_dtype = gnp.get_dtype()


@dataclass
class SVGDOptions:
    n_steps: int = 500
    step_size: float = 1e-2
    bandwidth: Optional[float] = None
    bandwidth_scale: float = 1.0
    bandwidth_min: Optional[float] = None
    preconditioner_diag: Optional[np.ndarray] = None
    initial_temperature: float = 10.0
    final_temperature: float = 1.0
    annealing_schedule: str = "geometric"
    sampling_box: Optional[list] = None
    store_particles_history: bool = False
    # optional jax.sharding.Mesh: shard the particle axis across devices
    mesh: Optional[Any] = None
    mesh_axis_name: str = "particles"
    verbose: int = 1
    progress: bool = True
    log_every: int = 50
    jitter: float = 1e-12
    seed: Optional[int] = None


def _normalize_bounds(box, dim, *, box_name="box"):
    if not (isinstance(box, (list, tuple)) and len(box) == 2):
        raise ValueError(f"{box_name} must be of the form [lower, upper].")
    lower, upper = box
    if np.isscalar(lower) and np.isscalar(upper):
        lower_b = np.full(dim, float(lower))
        upper_b = np.full(dim, float(upper))
    else:
        lower_b = np.asarray(lower, dtype=float).reshape(-1)
        upper_b = np.asarray(upper, dtype=float).reshape(-1)
        if lower_b.shape[0] == 1:
            lower_b = np.tile(lower_b, dim)
        if upper_b.shape[0] == 1:
            upper_b = np.tile(upper_b, dim)
        if lower_b.shape[0] != dim or upper_b.shape[0] != dim:
            raise ValueError(f"{box_name} bounds must match dimension.")
    return jnp.asarray(lower_b), jnp.asarray(upper_b), lower_b, upper_b


def _annealed_temperatures(n_steps, initial_temperature, final_temperature,
                           schedule):
    t0, t1 = float(initial_temperature), float(final_temperature)
    if t0 <= 0.0 or t1 <= 0.0:
        raise ValueError("Temperatures must be > 0.")
    if n_steps <= 1:
        return np.full(max(n_steps, 0), t1)
    u = np.arange(n_steps) / (n_steps - 1)
    if schedule == "linear":
        return t0 + u * (t1 - t0)
    if schedule == "geometric":
        return t0 * (t1 / t0) ** u
    raise ValueError("annealing_schedule must be 'linear' or 'geometric'.")


def _resolve_preconditioner(preconditioner_diag, dim, *, jitter):
    if preconditioner_diag is None:
        return jnp.ones(dim, dtype=_dtype)
    diag = np.asarray(preconditioner_diag, dtype=float).reshape(-1)
    if diag.shape[0] == 1:
        diag = np.tile(diag, dim)
    if diag.shape[0] != dim:
        raise ValueError(
            "preconditioner_diag must have length equal to particle dimension."
        )
    if np.any(diag <= 0.0):
        raise ValueError("preconditioner_diag must be strictly positive.")
    return jnp.asarray(np.clip(diag, float(jitter), None))


def rbf_kernel_matrix(particles, *, bandwidth=None, bandwidth_scale=1.0,
                      bandwidth_min=None, jitter=1e-12):
    """RBF kernel on particles with median-heuristic bandwidth.

    Returns (kernel, sq_dists, h).  h = scale * median(sq_dists>0) /
    log(n+1) when bandwidth is None (reference svgd.py:169-238).
    jit-safe: the median is taken over the off-diagonal entries.
    """
    particles = gnp.asarray(particles)
    if particles.ndim != 2:
        raise ValueError("particles must have shape (n_particles, dim).")
    if float(bandwidth_scale) <= 0.0:
        raise ValueError("bandwidth_scale must be > 0.")
    if bandwidth_min is not None and float(bandwidth_min) <= 0.0:
        raise ValueError("bandwidth_min must be > 0 when provided.")

    diffs = particles[:, None, :] - particles[None, :, :]
    sq_dists = jnp.sum(diffs * diffs, axis=2)
    n = particles.shape[0]

    if bandwidth is None:
        eye = jnp.eye(n, dtype=bool)
        off = jnp.where(eye, jnp.nan, sq_dists)
        median_sq = jnp.nanmedian(off) if n > 1 else jnp.asarray(0.0, _dtype)
        scale = jnp.log(jnp.asarray(float(n) + 1.0, dtype=_dtype))
        scale = jnp.maximum(scale, 1e-12)
        h = float(bandwidth_scale) * median_sq / scale
        h = jnp.where(jnp.isfinite(h) & (h > float(jitter)), h,
                      max(float(bandwidth_scale), float(jitter)))
    else:
        h = jnp.asarray(float(bandwidth_scale) * float(bandwidth), dtype=_dtype)
        h = jnp.where(h > float(jitter), h, float(jitter))
    if bandwidth_min is not None:
        h = jnp.maximum(h, float(bandwidth_min))

    kernel = jnp.exp(-sq_dists / h)
    return kernel, sq_dists, h


def _make_step(log_prob, *, step_size, bandwidth, bandwidth_scale,
               bandwidth_min, preconditioner, lower_b, upper_b, jitter):
    """Pure SVGD step: (particles, temperature) -> (particles', info)."""

    def tempered_vg(theta, temperature):
        def lp(t):
            v = jnp.asarray(log_prob(t)).reshape(())
            return v / temperature

        value, grad = jax.value_and_grad(lp)(theta)
        if lower_b is not None:
            outside = jnp.any(theta < lower_b) | jnp.any(theta > upper_b)
            value = jnp.where(outside, -jnp.inf, value)
        value = jnp.where(jnp.isnan(value), -jnp.inf, value)
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        return value, grad

    def step(particles, temperature):
        if lower_b is not None:
            particles = jnp.clip(particles, lower_b[None, :], upper_b[None, :])

        values, scores = jax.vmap(tempered_vg, in_axes=(0, None))(
            particles, temperature
        )
        alive = jnp.isfinite(values)
        alive_count = jnp.sum(alive)
        scores = jnp.where(alive[:, None], scores, 0.0)

        kernel, sq_dists, h = rbf_kernel_matrix(
            particles, bandwidth=bandwidth, bandwidth_scale=bandwidth_scale,
            bandwidth_min=bandwidth_min, jitter=jitter,
        )
        kernel = kernel * alive[:, None] * alive[None, :]

        denom = jnp.maximum(alive_count, 1).astype(particles.dtype)
        score_term = (kernel @ scores) / denom
        diffs = particles[:, None, :] - particles[None, :, :]
        repulsion = (2.0 / h) * jnp.sum(kernel[:, :, None] * diffs, axis=1) / denom
        velocity = (score_term + repulsion) * preconditioner[None, :]
        velocity = jnp.where(alive[:, None], velocity, 0.0)
        velocity = jnp.where(jnp.isfinite(velocity), velocity, 0.0)

        particles_next = particles + float(step_size) * velocity
        if lower_b is not None:
            particles_next = jnp.clip(particles_next, lower_b[None, :],
                                      upper_b[None, :])
        info = {
            "log_prob_values": values,
            "bandwidth": h,
            "velocity_norm": jnp.mean(jnp.linalg.norm(velocity, axis=1)),
            "alive_count": alive_count,
        }
        return particles_next, info

    return step


def svgd_step(log_prob, particles, *, step_size, temperature=1.0,
              bandwidth=None, bandwidth_scale=1.0, bandwidth_min=None,
              preconditioner_diag=None, sampling_box=None, jitter=1e-12):
    """One SVGD update (eager convenience wrapper around the pure step)."""
    particles = gnp.asarray(particles)
    if particles.ndim != 2:
        raise ValueError("particles must have shape (n_particles, dim).")
    if float(step_size) <= 0.0:
        raise ValueError("step_size must be > 0.")
    if float(temperature) <= 0.0:
        raise ValueError("temperature must be > 0.")
    dim = particles.shape[1]
    lower_b = upper_b = None
    if sampling_box is not None:
        lower_b, upper_b, _, _ = _normalize_bounds(sampling_box, dim,
                                                   box_name="sampling_box")
    preconditioner = _resolve_preconditioner(preconditioner_diag, dim,
                                             jitter=float(jitter))
    step = _make_step(
        log_prob, step_size=step_size, bandwidth=bandwidth,
        bandwidth_scale=bandwidth_scale, bandwidth_min=bandwidth_min,
        preconditioner=preconditioner, lower_b=lower_b, upper_b=upper_b,
        jitter=jitter,
    )
    particles_next, info = step(particles, jnp.asarray(float(temperature)))
    info["temperature"] = jnp.asarray(float(temperature))
    return particles_next, info


def svgd_sample(log_prob, particles_initial=None, *, n_particles=None,
                dim=None, init_box=None, options: SVGDOptions = None):
    """Annealed SVGD run; the whole step loop is one jitted lax.scan.

    Returns (particles, info) with traces: log_prob_trace (n_steps, n),
    bandwidth/temperature/velocity_norm traces, particles history
    (optional), final log-probs.
    """
    opts = SVGDOptions() if options is None else options
    if int(opts.n_steps) < 0:
        raise ValueError("n_steps must be >= 0.")

    if particles_initial is None:
        if init_box is None:
            raise ValueError("Provide particles_initial or init_box.")
        if n_particles is None or int(n_particles) <= 0:
            raise ValueError(
                "n_particles must be provided and > 0 when init_box is used."
            )
        if dim is None:
            lower = init_box[0]
            if np.isscalar(lower):
                raise ValueError(
                    "dim must be provided when init_box lower bound is scalar."
                )
            dim = int(len(lower))
        _, _, lower_np, upper_np = _normalize_bounds(init_box, int(dim),
                                                     box_name="init_box")
        particles = gnp.asarray(
            randunif(int(dim), int(n_particles), [lower_np, upper_np],
                     seed=opts.seed)
        )
    else:
        particles = gnp.asarray(particles_initial)
        if particles.ndim == 1:
            particles = particles.reshape(1, -1)
        elif particles.ndim != 2:
            raise ValueError("particles_initial must be 1D or 2D.")

    if opts.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _ndev = opts.mesh.shape[opts.mesh_axis_name]
        if particles.shape[0] % _ndev != 0:
            raise ValueError(
                f"n_particles ({particles.shape[0]}) must be divisible by "
                f"the mesh axis size ({_ndev})"
            )
        particles = jax.device_put(
            particles,
            NamedSharding(opts.mesh, PartitionSpec(opts.mesh_axis_name)),
        )
    n_eff, dim_eff = particles.shape
    if n_particles is not None and int(n_particles) != n_eff:
        raise ValueError("n_particles does not match particles_initial.")
    if dim is not None and int(dim) != dim_eff:
        raise ValueError("dim does not match particles_initial.")

    lower_b = upper_b = None
    if opts.sampling_box is not None:
        lower_b, upper_b, _, _ = _normalize_bounds(opts.sampling_box, dim_eff,
                                                   box_name="sampling_box")
    preconditioner = _resolve_preconditioner(opts.preconditioner_diag, dim_eff,
                                             jitter=float(opts.jitter))
    step = _make_step(
        log_prob, step_size=opts.step_size, bandwidth=opts.bandwidth,
        bandwidth_scale=opts.bandwidth_scale, bandwidth_min=opts.bandwidth_min,
        preconditioner=preconditioner, lower_b=lower_b, upper_b=upper_b,
        jitter=opts.jitter,
    )

    temperatures = jnp.asarray(
        _annealed_temperatures(int(opts.n_steps), opts.initial_temperature,
                               opts.final_temperature, opts.annealing_schedule)
    )

    store_history = bool(opts.store_particles_history)

    @jax.jit
    def run(particles, temperatures):
        def body(p, T):
            p_next, info = step(p, T)
            out = dict(info, temperature=T)
            if store_history:
                out["particles"] = p_next
            return p_next, out

        return lax.scan(body, particles, temperatures)

    if int(opts.n_steps) > 0:
        particles, traces = run(particles, temperatures)
    else:
        traces = {
            "log_prob_values": jnp.zeros((0, n_eff)),
            "bandwidth": jnp.zeros((0,)),
            "temperature": jnp.zeros((0,)),
            "velocity_norm": jnp.zeros((0,)),
            "alive_count": jnp.zeros((0,), dtype=jnp.int64),
        }

    # host-side progress log from traces (message format of the reference)
    if opts.progress and int(opts.verbose) > 0 and int(opts.n_steps) > 0:
        lp_trace = np.asarray(traces["log_prob_values"])
        vel_trace = np.asarray(traces["velocity_norm"])
        bw_trace = np.asarray(traces["bandwidth"])
        T_trace = np.asarray(traces["temperature"])
        alive_trace = np.asarray(traces["alive_count"])
        for s in range(int(opts.n_steps)):
            if not (
                s == 0
                or s + 1 == int(opts.n_steps)
                or (s + 1) % max(int(opts.log_every), 1) == 0
            ):
                continue
            alive = np.isfinite(lp_trace[s])
            n_alive = int(alive_trace[s])
            if n_alive > 0:
                mean_lp = float(lp_trace[s][alive].mean())
                best_lp = float(lp_trace[s][alive].max())
                best_criterion = -float(T_trace[s]) * best_lp
            else:
                mean_lp = best_lp = float("-inf")
                best_criterion = float("inf")
            print(
                f"svgd iter {s + 1}/{int(opts.n_steps)}: "
                f"T={float(T_trace[s]):.6g}, "
                f"bandwidth={float(bw_trace[s]):.6g}, "
                f"n_alive={n_alive}/{n_eff}, "
                f"mean_log_prob={mean_lp:.6g}, "
                f"best_log_prob={best_lp:.6g}, "
                f"best_criterion={best_criterion:.6g}, "
                f"mean_velocity_norm={float(vel_trace[s]):.6g}"
            )

    def safe_lp(t):
        v = jnp.asarray(log_prob(t)).reshape(())
        return jnp.where(jnp.isnan(v), -jnp.inf, v)

    final_log_probs = jax.jit(jax.vmap(safe_lp))(particles)

    info = {
        "options": opts,
        "log_prob_trace": traces["log_prob_values"],
        "bandwidth_trace": traces["bandwidth"],
        "temperature_trace": traces["temperature"],
        "velocity_norm_trace": traces["velocity_norm"],
        "log_prob_final": final_log_probs,
        "particles_final": particles,
    }
    if store_history and int(opts.n_steps) > 0:
        info["particles_history"] = traces["particles"]
    return particles, info


def plot_svgd_empirical_distributions(particles_or_info, parameter_indices=None,
                                      parameter_indices_pooled=None, bins=50):
    """Marginal histograms (+ KDE) of an SVGD particle cloud."""
    import matplotlib.pyplot as plt
    from scipy import stats

    if isinstance(particles_or_info, dict):
        particles = np.asarray(particles_or_info["particles_final"])
        lp = np.asarray(particles_or_info["log_prob_final"])
        particles = particles[np.isfinite(lp)]
    else:
        particles = np.asarray(gnp.to_np(gnp.asarray(particles_or_info)))
    dim = particles.shape[1]

    figs = {"individual": None, "pooled": None}
    if parameter_indices is None and parameter_indices_pooled is None:
        parameter_indices = list(range(dim))

    if parameter_indices is not None:
        n = len(parameter_indices)
        fig, axes = plt.subplots(n, 1, figsize=(8, min(9, 2.5 * n)))
        if n == 1:
            axes = [axes]
        for k, p in enumerate(parameter_indices):
            data = particles[:, p]
            axes[k].hist(data, bins=bins, density=True, alpha=0.6)
            if data.shape[0] > 2 and data.std() > 0:
                xs = np.linspace(data.min(), data.max(), 200)
                axes[k].plot(xs, stats.gaussian_kde(data)(xs))
            axes[k].set_ylabel(f"param {p}")
        plt.tight_layout()
        figs["individual"] = fig

    if parameter_indices_pooled is not None:
        fig, ax = plt.subplots(figsize=(8, 5))
        for p in parameter_indices_pooled:
            ax.hist(particles[:, p], bins=bins, density=True, alpha=0.4,
                    label=f"param {p}")
        ax.legend()
        plt.tight_layout()
        figs["pooled"] = fig

    plt.show()
    return figs
