# gpmp_tpu/parallel/likelihood.py
"""Sharded large-n GP selection criteria over a device mesh.

Same mathematics as gpmp_tpu.core.likelihood (profiled REML, one
Cholesky -- reference semantics /root/reference/gpmp/core/likelihood.py
:30-129) but with the (n, n) covariance row-sharded across devices and
factorized by parallel.chol.sharded_cholesky, so n is bounded by
aggregate HBM instead of one chip (the reference's only large-n answer
is mini-batched criteria, SURVEY.md section 5).

The model kernel is called as cross-covariance (x_rows, x_full), which
skips its `y is x` self-branch; the self-vs-cross diagonal difference
(noise variance + nugget) is measured once per covparam with two O(n)
pairwise evaluations and added back to the global diagonal locally on
each shard.
"""

from math import log, pi

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

import gpmp_tpu.num as gnp
from gpmp_tpu.core.likelihood import _nan_to_inf
from gpmp_tpu.core.linalg import _engine_for
from .chol import sharded_solve_and_logdet
from .mixed import sharded_mp_solve_and_logdet


def _largest_divisor_leq(n, bound):
    """Largest divisor of n that is <= bound (>=1)."""
    best = 1
    i = 1
    while i * i <= n:
        if n % i == 0:
            for c in (i, n // i):
                if best < c <= bound:
                    best = c
        i += 1
    return best


def _engine_solve_and_logdet(K, rhs, mesh, axis_name, block, mixed_ok=True,
                             factor=None):
    """Dispatch to the mixed-precision sharded engine when configured
    (GPMP_CHOL_ENGINE=mixed), else the exact-f64 distributed Cholesky."""
    if factor is not None:
        return sharded_solve_and_logdet(
            K, rhs, mesh, axis_name=axis_name, block=block, factor=factor
        )
    if mixed_ok and K.dtype == jnp.float64 and _engine_for(K, rhs) == "mixed":
        return sharded_mp_solve_and_logdet(
            K, rhs, mesh, axis_name=axis_name, block=block
        )
    return sharded_solve_and_logdet(
        K, rhs, mesh, axis_name=axis_name, block=block
    )


def _diag_correction(model, covparam, xi, block=32):
    """Self-branch minus cross-branch diagonal (noise variance + nugget,
    per point), computed EXACTLY from the full kernel in O(n block)
    work.  The kernel's ``pairwise`` branch cannot be trusted here:
    reference-convention kernels (e.g. reference example07) return
    *prior* variances pairwise, excluding observation noise and nugget,
    which would silently drop the noise diagonal from the sharded gram.
    ``x + 0*x`` defeats the kernel's ``y is x`` identity test.

    Only the block DIAGONALS are read, so the block size is a free
    parameter: vmap over many SMALL blocks instead of round 3's
    lax.map over (256, 256) ones -- the sequential map of emulated-f64
    kernel blocks was ~60% of the whole n=8192 REML value on the v5e
    (round-4 stage profile), all of it spent computing a noise
    diagonal.  One vmapped program costs n*block kernel evaluations
    and no sequential dispatch chain."""
    n, d = xi.shape
    b = min(block, n)
    nb = -(-n // b)
    npad = nb * b - n
    xpad = (
        jnp.concatenate([xi, jnp.tile(xi[:1], (npad, 1))], axis=0)
        if npad else xi
    )
    xb = xpad.reshape(nb, b, d)

    def one(xblk):
        K_self = model.covariance(xblk, xblk, covparam)
        xc = xblk + jnp.zeros_like(xblk)
        K_cross = model.covariance(xblk, xc, covparam)
        return jnp.diagonal(K_self) - jnp.diagonal(K_cross)

    return jax.vmap(one)(xb).reshape(-1)[:n]


def sharded_covariance(model, covparam, xi, mesh, axis_name="shard"):
    """Row-sharded (n, n) covariance with the self-branch diagonal.

    Returns K with sharding P(axis_name, None); each device computes its
    (n/n_dev, n) slab locally from a replicated copy of xi (the only
    communication is the O(n d) broadcast of the points)."""
    n = xi.shape[0]
    n_dev = 1 if mesh is None else mesh.shape[axis_name]
    if n % n_dev != 0:
        raise ValueError("n must be divisible by the mesh axis size")
    n_loc = n // n_dev
    corr = _diag_correction(model, covparam, xi)

    if n_dev == 1:
        # single device: no shard_map, no broadcast -- just the
        # cross-covariance with the measured self-branch diagonal
        xc = xi + jnp.zeros_like(xi)          # defeat the `y is x` branch
        Kl = model.covariance(xi, xc, covparam)
        return Kl + jnp.diag(corr.astype(Kl.dtype))

    def per_shard(x_loc, x_full, corr_loc, covparam):
        Kl = model.covariance(x_loc, x_full, covparam)
        off = lax.axis_index(axis_name) * n_loc
        grow = off + jnp.arange(n_loc, dtype=jnp.int32)[:, None]
        col = jnp.arange(n, dtype=jnp.int32)[None, :]
        # corr follows the cross-branch dtype: the diag correction may run
        # in f64 (kernels build f64 eye/ones on the self branch) even when
        # the gram is being recomputed in f32 for the backward pass
        corr_loc = corr_loc.astype(Kl.dtype)
        return Kl + jnp.where(col == grow, corr_loc[:, None], 0.0)

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(axis_name), P()),
        out_specs=P(axis_name),
    )
    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return f(
        jax.device_put(xi, shard),
        jax.device_put(xi, repl),
        jax.device_put(corr, shard),
        covparam,
    )


def _gram_f32_backward_active(covparam, xi, zi):
    """True when the mixed solve engine will run.

    The f32 gram backward only pays off when the solve engine's own
    backward is the f32 analytic VJP (the cotangent Kbar then carries
    eps32-level noise anyway).  Forward-mode autodiff -- under which
    the custom_vjp wrappers cannot trace at all -- is handled by the
    criterion entry points below: they catch the trace-time TypeError
    (ops.mixed.is_fwd_mode_error) and retry with mixed_ok=False."""
    if xi.dtype != jnp.float64:
        return False
    from gpmp_tpu.core.linalg import chol_engine

    return chol_engine(xi.shape[0]) == "mixed"


def _cov_with_f32_backward(model, xi, mesh, axis_name):
    """p -> row-sharded K (f64 forward) whose BACKWARD reruns the kernel
    chain in float32.

    The mixed engine's solve VJP produces Kbar from the f32 Kinv series
    (parallel/mixed.py), so Kbar's entries already carry eps32-level
    random noise; pulling it back through an emulated-f64 Matern chain
    is pure overhead (measured ~290 ms of a 400 ms n=4096 value+grad on
    v5e).  The f32 recompute keeps <Kbar, dK/dtheta> accurate to the
    same eps32-washout level the engine is specified at.

    Kernels that are not dtype-polymorphic (f64 constants on the cross
    branch promote the f32 recompute back to f64) are detected by
    abstract evaluation and fall back to the exact f64 remat backward.
    """
    xi32 = xi.astype(jnp.float32)

    def cov64(p):
        return sharded_covariance(model, p, xi, mesh, axis_name=axis_name)

    def cov32(p32):
        return sharded_covariance(model, p32, xi32, mesh,
                                  axis_name=axis_name)

    @jax.custom_vjp
    def cov(p):
        return cov64(p)

    def fwd(p):
        return cov64(p), p

    def bwd(p, Kbar):
        p32 = p.astype(jnp.float32)
        try:
            poly = jax.eval_shape(cov32, p32).dtype == jnp.float32
        except Exception:
            poly = False
        if poly:
            n = xi.shape[0]
            single = mesh is None or mesh.shape[axis_name] == 1
            # largest divisor of n <= 512 (mirrors _level2_chunk's
            # divisor search): keeps the HBM fix active for n not
            # divisible by 512, e.g. 8448 -> 384
            pb_chunk = _largest_divisor_leq(n, 512)
            if single and n >= 8192 and pb_chunk >= 64:
                # one whole-gram f32 pullback saves ~6 n x n autodiff
                # residuals (cdist, exp, polynomial) -- the last ~6 GB
                # that push the n=16384 single-chip gradient program
                # past HBM.  Row-chunked, residuals stay at one chunk.
                pbar = _chunked_gram_pullback(
                    model, p32, xi32, Kbar.astype(jnp.float32), pb_chunk
                )
                return (pbar.astype(p.dtype),)
            _K32, vjp32 = jax.vjp(cov32, p32)
            (pbar,) = vjp32(Kbar.astype(jnp.float32))
            return (pbar.astype(p.dtype),)
        _K, vjp64 = jax.vjp(cov64, p)
        (pbar,) = vjp64(Kbar)
        return (pbar,)

    cov.defvjp(fwd, bwd)
    return cov


def _chunked_gram_pullback(model, p32, xi32, Kbar32, chunk):
    """grad_p <Kbar, K(p)> for the single-device f32 gram, row-chunked.

    K(p) = cross_cov(xi, xi, p) + diag(corr(p)) (sharded_covariance's
    single-device form), so the pullback splits into a scan over row
    chunks of the cross-covariance: each chunk's d-dim parameter
    gradient is computed directly (residuals stay at one chunk's
    kernel chain) and ACCUMULATED IN FLOAT64 across chunks -- the
    cross-chunk sum is where eps32 noise previously compounded by
    another sqrt(nb) (round-5 envelope measurement); intra-chunk
    products stay f32 (the engine's class accuracy, ~1e-5 relative,
    BENCHMARKS.md gradient-envelope table).  The O(n)
    diagonal-correction term rides in the same f64 accumulator."""
    n, d = xi32.shape
    nb = n // chunk
    xc = xi32 + jnp.zeros_like(xi32)      # defeat the kernel's `y is x`
    diag_bar = jnp.diagonal(Kbar32)

    def blk(carry, xs):
        x_rows, kb = xs

        def chunk_loss(p):
            Kr = model.covariance(x_rows, xc, p)
            return jnp.sum(kb * Kr.astype(kb.dtype))

        g = jax.grad(chunk_loss)(p32)
        return carry + g.astype(jnp.float64), None

    g_cross, _ = lax.scan(
        blk,
        jnp.zeros(p32.shape, jnp.float64),
        (xi32.reshape(nb, chunk, d), Kbar32.reshape(nb, chunk, n)),
    )

    def diag_loss(p):
        corr = _diag_correction(model, p, xi32)
        return jnp.sum(diag_bar * corr.astype(diag_bar.dtype))

    # f64 out: callers cast to their param dtype; rounding the f64
    # accumulator back to f32 here would throw away the last ~1e-7
    return g_cross + jax.grad(diag_loss)(p32).astype(jnp.float64)


def _make_cov(model, covparam, xi, zi, mesh, axis_name, mixed_ok=True):
    """Gram constructor for the sharded criteria: f32-backward wrapper on
    the mixed-engine path, rematerialized f64 otherwise.

    The remat (jax.checkpoint) matters on the f64 path: the Matern chain
    otherwise saves O(10) n x n autodiff residuals, which at n=16384 f64
    exceeds single-chip HBM (observed 52 GB).  The custom-VJP wrapper
    stores only covparam, so it subsumes the remat."""
    if mixed_ok and _gram_f32_backward_active(covparam, xi, zi):
        return _cov_with_f32_backward(model, xi, mesh, axis_name)
    return jax.checkpoint(
        lambda p: sharded_covariance(model, p, xi, mesh, axis_name=axis_name)
    )


def _streamed_active(model, covparam, xi, mesh, axis_name):
    """True when the criterion should run on the streamed single-chip
    engine (parallel/streamed.py): n past the resident engine's HBM
    wall, mixed engine configured, f32-polymorphic kernel."""
    from .streamed import streamed_applicable

    try:
        return streamed_applicable(model, covparam, xi, mesh, axis_name)
    except Exception:
        return False


def _fwdmode_retry(trace_criterion):
    """Run trace_criterion(mixed_ok=True); when the mixed engine's
    custom-VJP wrappers reject a forward-mode (jacfwd/hessian) trace,
    retry without them.  The criteria are pure, so the failed trace
    commits nothing.  (The f64 retry path still uses the distributed
    Cholesky's own custom VJP, so full forward-mode through the SHARDED
    criteria remains unsupported -- same envelope as round 2 -- but the
    error now surfaces from the f64 path instead of being mis-detected
    by tracer introspection.)"""
    from gpmp_tpu.ops.mixed import is_fwd_mode_error

    try:
        return trace_criterion(True)
    except TypeError as e:
        if not is_fwd_mode_error(e):
            raise
        return trace_criterion(False)


def sharded_negative_log_restricted_likelihood(
    model, covparam, xi, zi, mesh, axis_name="shard", block=256, factor=None
):
    """Profiled REML with the covariance sharded over the mesh.

    Identical value to core.likelihood.negative_log_restricted_likelihood
    (impl='profiled'); differentiable end-to-end for value_and_grad.

    factor: a precomputed distributed Cholesky factor of THE COVARIANCE
    AT covparam (sharded_cholesky's L) -- skips the O(n^3)
    refactorization.  VALUE ONLY: the factor is a constant to autodiff,
    so gradients w.r.t. covparam would silently miss the factorization
    term; never pass factor under jax.grad."""

    def trace(mixed_ok):
        Pd = model.mean(xi, model.meanparam)
        n, q = Pd.shape
        rhs = jnp.concatenate([zi.reshape(-1, 1), Pd], axis=1)
        if factor is None and mixed_ok and _streamed_active(
                model, covparam, xi, mesh, axis_name):
            # beyond-HBM single-chip path: K is streamed from the
            # kernel, never materialized in f64 (parallel/streamed.py)
            from .streamed import streamed_mp_solve_and_logdet

            X, ldetK = streamed_mp_solve_and_logdet(
                model, covparam, xi, rhs
            )
        else:
            if factor is None:
                cov = _make_cov(model, covparam, xi, zi, mesh, axis_name,
                                mixed_ok)
                K = cov(covparam)
            else:
                # the factored solve never reads K; skip the O(n^2)
                # gram (eager callers would otherwise materialize it
                # for nothing)
                K = factor
            X, ldetK = _engine_solve_and_logdet(
                K, rhs, mesh, axis_name, block, mixed_ok, factor=factor
            )
        Kinv_z = X[:, 0]
        Kinv_P = X[:, 1:]
        M = Pd.T @ Kinv_P
        Cm = jnp.linalg.cholesky(M)
        b = Pd.T @ Kinv_z
        u = gnp.solve_triangular(Cm, b, lower=True)
        quad = zi @ Kinv_z - u @ u
        ldetM = 2.0 * jnp.sum(jnp.log(jnp.diag(Cm)))
        ldetPtP = gnp.logdet(Pd.T @ Pd)
        L = 0.5 * ((n - q) * log(2.0 * pi) + ldetK + ldetM - ldetPtP + quad)
        out = _nan_to_inf(L.reshape(()))
        if factor is not None:
            # covparam never enters the factored trace: differentiating
            # w.r.t. it would silently return zeros.  Raise instead.
            from .chol import value_only_wrt

            out = value_only_wrt(out, jnp.asarray(covparam))
        return out

    return _fwdmode_retry(trace)


def sharded_negative_log_likelihood_zero_mean(
    model, covparam, xi, zi, mesh, axis_name="shard", block=256
):
    """Zero-mean NLL with the covariance sharded over the mesh
    (see sharded_negative_log_restricted_likelihood for the gram
    backward strategy)."""

    def trace(mixed_ok):
        n = xi.shape[0]
        if mixed_ok and _streamed_active(model, covparam, xi, mesh,
                                         axis_name):
            from .streamed import streamed_mp_solve_and_logdet

            Kinv_z, ldetK = streamed_mp_solve_and_logdet(
                model, covparam, xi, zi
            )
        else:
            cov = _make_cov(model, covparam, xi, zi, mesh, axis_name,
                            mixed_ok)
            K = cov(covparam)
            Kinv_z, ldetK = _engine_solve_and_logdet(
                K, zi, mesh, axis_name, block, mixed_ok
            )
        L = 0.5 * (n * log(2.0 * pi) + ldetK + zi @ Kinv_z)
        return _nan_to_inf(L.reshape(()))

    return _fwdmode_retry(trace)
