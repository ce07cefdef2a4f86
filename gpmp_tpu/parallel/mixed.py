# gpmp_tpu/parallel/mixed.py
"""Mixed-precision sharded solve+logdet: the large-n fast path.

Sharded analogue of the dense mixed engine (ops/mixed.py), rebalanced
for the cost model of emulated float64 on this TPU generation
(measured: f64 matmul ~2 TFLOP/s vs f32 ~40 TFLOP/s, f64
Cholesky/triangular solves latency-bound).  The dense engine forms
E = M K M^T with two f64 (n, n) matmuls; at large n that dominates, so
this engine replaces it with the *factorization residual* identity,
which needs exactly ONE f64 (n, n) matmul:

  L32 = sharded f32 Cholesky of K            (f32 matmuls, cheap)
  M32 = L32^{-1}  (blocked f32 solves)       (f32 matmuls, cheap)
  R   = K - L32 L32^T                        (the one f64 matmul)
  log det K = 2 sum log diag L32 + log det(I + H),   H = M32 R M32^T

H is computed with f32 matmuls: its entries carry the f64-quality
information of R with only eps32 *relative* error, and log det(I + H)
is evaluated by a quartic trace series whose contractions run in f64.
Using the approximate inverse M32 instead of the exact L32^{-1} in H
perturbs the correction only at second order (error ~ |H| * eps32).

Solves are f32-preconditioner refinement exactly as in the dense
engine: x += M^T M (b - K x) with f64 residuals (O(n^2) f64 per
sweep).

Backward is an analytic custom VJP with ZERO f64 (n, n) matmuls:
Kbar = ldbar * Kinv - S X^T with Kinv ~= M^T (I - H + H^2 - H^3) M
computed in f32.  The eps32-level *random* rounding noise on Kbar
washes out in the <Kbar, dK/dtheta> contraction (it sums n^2 terms),
leaving gradient errors far below optimizer tolerances, while the
criterion VALUE keeps ~1e-9 relative agreement with the f64 engine
(tests/test_parallel_chol.py).

Convergence guards mirror ops/mixed.py: solves check their final
relative residual, the logdet series checks |H|_F^2 < tau and falls
back to a second f32 factorization level (of I + H) for ill-
conditioned K; past that, NaN -> the criterion wrappers map to +inf.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .chol import (
    _blocked_solve_lower_impl,
    _sharded_cholesky_impl,
    _single_device,
)

DEFAULT_REFINE_ITERS = 4
_RIDGE_FACTOR = 10.0
_SOLVE_RTOL2 = 1e-12          # as ops/mixed.py
_SERIES_TAU = 1e-4            # |H|_F^2 bound for the quartic series
_LEVEL2_TAU = 1e-8            # |G|_F^2 bound inside the robust branch
                              # (as ops/mixed.py _LOGDET_FTOL2)


def _row_shard(x, mesh, axis_name):
    if _single_device(mesh, axis_name):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1))))
    )


def _f32mm(a, b):
    """f32 matmul (inputs already f32); sharding follows operands."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


# K @ X for skinny rhs as multiply + f64 reduction (bandwidth-bound;
# see ops/mixed.py).  With K row-sharded the reduction axis is local,
# so sharding propagates exactly like the dot it replaces.
from gpmp_tpu.ops.mixed import _f64_matvec


def _plain_f32_tri_pair(E32):
    """(F, F^{-1}) for a near-identity SPD f32 matrix, via the plain XLA
    Cholesky (single HLO op; used only on the robust branch where a
    nested sharded factorization would bloat the compiled program).
    GSPMD replicates these ops on a mesh -- fine for a fallback path.

    The inverse deliberately avoids solve_triangular with an (n, n)
    identity RHS at large n: XLA:TPU lowers that to ~n/128 blocked
    forward-substitution steps whose remat clones each keep an
    (n - 128k, n) temp live -- measured 64 GB of HLO temps at n=16384
    (the round-2 OOM).  The recursive-doubling inverse is batched
    matmuls with bounded temps (and is faster anyway at n >= 8192)."""
    n = E32.shape[0]
    ridge = _RIDGE_FACTOR * jnp.finfo(jnp.float32).eps * (jnp.trace(E32) / n)
    F = jnp.linalg.cholesky(E32 + ridge * jnp.eye(n, dtype=jnp.float32))
    if n >= 4096:
        from gpmp_tpu.ops.mixed import _block_tri_inv

        return F, _block_tri_inv(F, base=128)
    MF = jax.scipy.linalg.solve_triangular(
        F, jnp.eye(n, dtype=jnp.float32), lower=True
    )
    return F, MF


def _sharded_f32_preconditioner(K, mesh, axis_name, block):
    """(L32, M32 = L32^{-1}) of the ridged f32 cast of K, both f32 and
    row-sharded.  The ridge (~10 eps32 mean diag) keeps the f32
    factorization alive near the f32 conditioning edge; the residual
    identity absorbs it exactly."""
    n = K.shape[0]
    K32 = K.astype(jnp.float32)
    ridge = _RIDGE_FACTOR * jnp.finfo(jnp.float32).eps * (jnp.trace(K32) / n)
    K32 = K32 + ridge * jnp.eye(n, dtype=jnp.float32)
    if _single_device(mesh, axis_name):
        # XLA's native f32 Cholesky beats the blocked fori-loop on one
        # device (measured 24 vs 31 ms at n=4096 on v5e)
        L32 = jnp.linalg.cholesky(K32)
        if n >= 8192:
            # the recursive-doubling inverse (batched matmuls, log2
            # levels) beats the sequential panel solve once the panel
            # latency dominates (measured 34.6 vs 49.5 ms at n=8192;
            # the panel solve still wins at n=4096, 4.5 vs 10.8 ms)
            from gpmp_tpu.ops.mixed import _block_tri_inv

            return L32, _block_tri_inv(L32, base=128)
    else:
        L32 = _sharded_cholesky_impl(
            K32, mesh, axis_name=axis_name, block=block, panel_impl="direct"
        )
    eye32 = _row_shard(jnp.eye(n, dtype=jnp.float32), mesh, axis_name)
    M32 = _blocked_solve_lower_impl(L32, eye32, block, mesh, axis_name)
    return L32, M32


def _apply_precond(M32, R64):
    """M^T (M r) with the M applications in f32, result cast to f64.

    The correction-solve of iterative refinement only needs the
    preconditioner's own (f32) accuracy -- the f64 information lives in
    the residual, which IS computed in f64 by the caller.  Running the
    two matvecs in f32 avoids the emulated-f64 matvec path entirely
    (measured ~8.6 ms per f64 (n, n) x (n, 2) apply at n=4096 on v5e,
    vs noise for the f32 one)."""
    r32 = R64.astype(jnp.float32)
    c32 = _f32mm(M32.T, _f32mm(M32, r32))
    return c32.astype(R64.dtype)


def _refined_solve(K, B, M32, n_refine, mesh=None, axis_name=None):
    """K X = B by f32-preconditioned refinement with f64 residuals.
    NaN on non-convergence (relative residual guard).

    Single-device meshes run an early-exit while_loop: each sweep costs
    one emulated-f64 (n, n) x (n, m) matvec (~8.6 ms at n=4096 on v5e),
    and well-conditioned K converges in 1-2 sweeps, so exiting on the
    residual check instead of running a fixed count saves ~2 matvecs
    per solve.  n_refine is the sweep CAP.  Multi-device meshes keep the
    fixed unrolled loop: f64 while_loop carries through sharded
    programs stress the same HloReplicationAnalysis path that crashes
    this TPU toolchain on f64 cond operands (see _mp_core), and the
    sweeps there overlap collectives anyway."""
    squeeze = B.ndim == 1
    Bm = B.reshape(-1, 1) if squeeze else B
    bb = jnp.maximum(jnp.sum(Bm * Bm), jnp.finfo(K.dtype).tiny)
    X = _apply_precond(M32, Bm)
    R = Bm - _f64_matvec(K, X)
    if mesh is not None and _single_device(mesh, axis_name):
        # sweep until the residual hits the f64 floor or stagnates
        # (< 4x reduction), i.e. exactly as converged as the unrolled
        # loop, in however many sweeps the conditioning actually needs
        floor2 = 1e-24

        def _not_done(carry):
            _X, _R, r2, r2_prev, it = carry
            return (r2 >= floor2) & (r2 < 0.25 * r2_prev) & (it < n_refine)

        def _sweep(carry):
            X_, R_, r2, _r2p, it = carry
            X_ = X_ + _apply_precond(M32, R_)
            R_ = Bm - _f64_matvec(K, X_)
            return X_, R_, jnp.sum(R_ * R_) / bb, r2, it + 1

        r2_0 = jnp.sum(R * R) / bb
        X, R, _, _, _ = jax.lax.while_loop(
            _not_done, _sweep,
            (X, R, r2_0, jnp.full((), jnp.inf, r2_0.dtype), jnp.int32(0)),
        )
    else:
        for _ in range(n_refine):
            X = X + _apply_precond(M32, R)
            R = Bm - _f64_matvec(K, X)
    rel2 = jnp.sum(R * R) / bb
    X = jnp.where(rel2 < _SOLVE_RTOL2, X, jnp.nan)
    return X.reshape(-1) if squeeze else X


def _trace_dot(A, B_t):
    """tr(A @ B) = sum(A * B^T) with the contraction in f64 (entries may
    be f32 -- the promotion is elementwise, no f64 matmul)."""
    return jnp.sum(A.astype(jnp.float64) * B_t.astype(jnp.float64))


def _streamed_level2_g(H, MF32, chunk):
    """(tr G, |G|_F^2) for G = MF (I + H) MF^T - I without materializing
    G, MF64, or E64 -- the level-2 sandwich of the robust logdet branch,
    chunked so its emulated-f64 matmul temps stay bounded.

    Two passes, both f64 for the same cancellation reason as the dense
    form (G hides under the identity):
      1. T = (I + H) MF^T built block-by-block (outer lax.map over MF
         row chunks = T column blocks, inner lax.map over H row chunks);
      2. G row-chunks MF[rc] @ T - I[rc] inside a scan that only carries
         the two scalars, the dot blocked over T's column blocks.
    EVERY emulated-f64 dot here sees only (chunk, n)-sized operands:
    XLA hoists the split-operand expansion (8 f32 words per f64 array)
    of loop-INVARIANT dot operands out of the loop, so a dot against
    the full (n, n) H or T plants an 8 n^2 f32 temp (8 GB at n=16384 --
    the round-2 follow-up OOM) regardless of how the other operand is
    streamed.  Blocking both operands caps the hoisted expansion at
    8 * chunk * n words; output blocking leaves each contraction over
    the full n, so the result is bitwise the unblocked sandwich.
    Requires n % chunk == 0 (callers cap chunk so n*chunk*32B <= 0.5 GB).
    Single-device only: the f64 scan carry is fine there (sharded f64
    loop operands crash this TPU toolchain's HloReplicationAnalysis)."""
    n = H.shape[0]
    nb = n // chunk
    hp = jax.lax.Precision.HIGHEST
    H64r = H.astype(jnp.float64).reshape(nb, chunk, n)
    MFr = MF32.reshape(nb, chunk, n)

    def _t_colblock(mf_rows32):                   # (chunk, n) f32
        mfc = mf_rows32.astype(jnp.float64).T     # (n, chunk)

        def _rb(h_rows):                          # (chunk, n) f64
            return jnp.dot(h_rows, mfc, precision=hp)

        return jax.lax.map(_rb, H64r).reshape(n, chunk) + mfc

    # column blocks of T, kept block-major so pass 2 can slice them
    Tcb = jax.lax.map(_t_colblock, MFr)           # (nb, n, chunk)

    def _g_rows(carry, xs):
        g1, g2 = carry
        i, mf_rows32 = xs
        mf64 = mf_rows32.astype(jnp.float64)      # (chunk, n)

        def _cb(t_cols):                          # (n, chunk) f64
            return jnp.dot(mf64, t_cols, precision=hp)

        Gi = jax.lax.map(_cb, Tcb)                # (nb, chunk, chunk)
        Gi = jnp.transpose(Gi, (1, 0, 2)).reshape(chunk, n)
        r = jnp.arange(chunk)
        eye_rows = (
            jnp.arange(n)[None, :] == (i * chunk + r)[:, None]
        ).astype(jnp.float64)
        Gi = Gi - eye_rows
        g1 = g1 + jnp.sum(Gi * eye_rows)
        g2 = g2 + jnp.sum(Gi * Gi)
        return (g1, g2), None

    (g1, g2), _ = jax.lax.scan(
        _g_rows,
        (jnp.float64(0.0), jnp.float64(0.0)),
        (jnp.arange(nb), MFr),
    )
    return g1, g2


# below this chunk the stream degenerates toward an n-iteration scan of
# skinny dots (severe compile/runtime cliff); use the dense sandwich
_LEVEL2_CHUNK_FLOOR = 128


def _level2_chunk(n):
    """Streaming chunk for _streamed_level2_g: the LARGEST divisor of n
    that caps the hoisted split-operand temp (8 f32 words x n x chunk)
    at ~0.5 GB.  Searches true divisors (not just n//8 halvings) so n
    with large odd factors still gets a usable chunk; callers must
    treat results below _LEVEL2_CHUNK_FLOOR as "don't stream"."""
    cap = max((1 << 29) // (32 * n), 1)
    best = 1
    i = 1
    while i * i <= n:
        if n % i == 0:
            for c in (i, n // i):
                if best < c <= cap:
                    best = c
        i += 1
    return best


# R = K - L L^T in f64, returned f32 (triangular panels, ~n^3/3
# emulated-f64 FLOPs); canonical definition shared with the dense
# engine lives in ops/mixed.py.
from gpmp_tpu.ops.mixed import _factorization_residual_f32


def _mp_core(K, B, mesh, axis_name, block, n_refine):
    """Shared forward: returns (X, ld, residuals-for-vjp)."""
    n = K.shape[0]
    L32, M32 = _sharded_f32_preconditioner(K, mesh, axis_name, block)

    # the ONE f64 (n, n) matmul: factorization residual.  On a single
    # device the panel width is a free parameter; ~n/8 measured best
    # (panels block 512: 32.7 ms at n=4096; block 1024: 168.7 vs 183.3
    # at n=8192).  Multi-device keeps the mesh block so the panel
    # slices align with the row sharding.
    L64 = L32.astype(jnp.float64)
    rblock = block
    if _single_device(mesh, axis_name):
        if n >= 8192 and n % 1024 == 0:
            rblock = 1024
        elif n % 512 == 0:
            rblock = 512
    R32 = _factorization_residual_f32(K, L64, rblock)
    R32 = _row_shard(R32, mesh, axis_name)

    H = _f32mm(M32, _f32mm(R32, M32.T))       # H = M R M^T, f32
    H = _row_shard(H, mesh, axis_name)
    H2 = _row_shard(_f32mm(H, H), mesh, axis_name)

    c2 = _trace_dot(H, H.T)

    # TOOLCHAIN CONSTRAINT: the branches must receive ONLY f32 arrays.
    # float64 cond operands (the emulation pass splits each into an
    # (hi, lo) pair) crash this TPU compiler's HloReplicationAnalysis
    # with a shape_util CHECK ("Invalid index {0} for shape f32[n,n]")
    # once the conditional carries more than two of them.  The f64
    # scalars (base, c1..c4) are therefore recomputed INSIDE each
    # branch from the f32 operands -- O(n) diagonal reductions and
    # elementwise trace contractions, trivially cheap.  f64 branch
    # OUTPUTS are fine.

    def _series(ops):
        L32_, H_, H2_ = ops
        base = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L32_).astype(jnp.float64))
        )
        c1 = jnp.sum(jnp.diagonal(H_).astype(jnp.float64))
        c2_ = _trace_dot(H_, H_.T)
        c3 = _trace_dot(H2_, H_.T)
        c4 = _trace_dot(H2_, H2_.T)
        return base + c1 - c2_ / 2.0 + c3 / 3.0 - c4 / 4.0

    def _robust(ops):
        # Ill-conditioned K: the series in H diverges.  Second-level
        # identity exactly as the dense engine (ops/mixed.py
        # _level2_logdet): factor E = I + H with the PLAIN XLA f32
        # Cholesky (one HLO op -- a second nested sharded fori-loop
        # factorization is what overwhelmed the TPU compiler).  The
        # inner defect G = M_F E M_F^T - I hides under the identity, so
        # the sandwich must run in f64 (f32 would bury G under its own
        # rounding): two extra f64 (n, n) matmuls, on this branch only.
        L32_, H_, _H2 = ops
        base = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L32_).astype(jnp.float64))
        )
        F32, MF32 = _plain_f32_tri_pair(jnp.eye(n, dtype=jnp.float32) + H_)
        lvl2_chunk = (
            _level2_chunk(n)
            if _single_device(mesh, axis_name) and n >= 12288
            else 0
        )
        if lvl2_chunk >= _LEVEL2_CHUNK_FLOOR:
            # the dense sandwich's two emulated-f64 (n, n) matmuls cost
            # ~16 GB of split-operand HLO temps at n=16384 (one batched
            # f32[8,n,n] accumulator + two bf16[8,n,n] operand splits)
            # -- THE round-2 single-chip OOM.  Streamed with both dot
            # operands blocked the branch peaks at ~2 n^2 f64 + one
            # chunk's split temps (see _streamed_level2_g).
            g1, g2 = _streamed_level2_g(H_, MF32, lvl2_chunk)
        else:
            E64 = jnp.eye(n, dtype=jnp.float64) + H_.astype(jnp.float64)
            MF64 = MF32.astype(jnp.float64)
            G = MF64 @ (E64 @ MF64.T) - jnp.eye(n, dtype=jnp.float64)
            g1 = jnp.trace(G)
            g2 = jnp.sum(G * G)
        ld2 = (base
               + 2.0 * jnp.sum(jnp.log(jnp.diagonal(F32).astype(jnp.float64)))
               + g1 - g2 / 2.0)
        return jnp.where(g2 < _LEVEL2_TAU, ld2, jnp.nan)

    # NaN c2 (failed f32 factorization) compares False -> robust -> NaN
    ld = jax.lax.cond(c2 < _SERIES_TAU, _series, _robust, (L32, H, H2))

    X = _refined_solve(K, B, M32, n_refine, mesh, axis_name)
    return X, ld, (K, M32, H, H2, X)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _mp_sal(mesh, axis_name, block, n_refine, K, B):
    X, ld, _ = _mp_core(K, B, mesh, axis_name, block, n_refine)
    return X, ld


def _mp_sal_fwd(mesh, axis_name, block, n_refine, K, B):
    X, ld, res = _mp_core(K, B, mesh, axis_name, block, n_refine)
    return (X, ld), res


def _mp_sal_bwd(mesh, axis_name, block, n_refine, res, cot):
    """All-f32 backward (see module docstring for the error analysis).

    Kbar = ldbar * Kinv - S X^T,  Bbar = S = K^{-1} Xbar, with
    Kinv ~= M^T (I - H + H^2 - H^3) M evaluated by f32 matmuls.
    """
    Xbar, ldbar = cot
    K, M32, H, H2, X = res

    squeeze = Xbar.ndim == 1
    Xb = Xbar.reshape(-1, 1) if squeeze else Xbar
    Xm = X.reshape(-1, 1) if squeeze else X
    S = _refined_solve(K, Xb, M32, n_refine, mesh, axis_name)

    c2 = jnp.sum(H.astype(jnp.float64) * H.T.astype(jnp.float64))
    n = K.shape[0]

    # f32-only cond operands (see _mp_core: f64 operands crash this TPU
    # compiler); the predicate is computed outside and crosses as bool
    def _series_inv(ops):
        # Kinv ~= M^T (I - H + H^2) M, error O(|H|^3).  The forward
        # series keeps the quartic term because the VALUE needs ~1e-9;
        # Kbar only steers the optimizer, and on the series branch
        # |H|_F < 1e-2, so the truncation costs < 1e-6 relative on the
        # gradient while saving one (n, n) f32 matmul.
        M32_, H_, H2_ = ops
        Z = H_ - H2_
        return _f32mm(M32_.T, M32_) - _f32mm(M32_.T, _f32mm(Z, M32_))

    def _robust_inv(ops):
        # second-level preconditioner: Kinv ~= (M_F M)^T (M_F M) with
        # relative error |G| ~ eps32 -- ample for gradient use
        M32_, H_, _H2 = ops
        _F, MF32 = _plain_f32_tri_pair(jnp.eye(n, dtype=jnp.float32) + H_)
        W = _f32mm(MF32, M32_)
        return _f32mm(W.T, W)

    Kinv32 = jax.lax.cond(c2 < _SERIES_TAU, _series_inv, _robust_inv,
                          (M32, H, H2))
    Kinv = _row_shard(Kinv32.astype(jnp.float64), mesh, axis_name)

    # S @ Xm.T via broadcast-multiply accumulation: the emulated-f64 dot
    # builds its (n, n) output in 8 f32 words (2 x 8 n^2 f32 HLO temps =
    # 16 GB at n=16384 -- the gradient-program OOM); elementwise f64
    # products carry no word-split passes and peak at the 2 n^2 f64
    # output itself.  m is the criterion rhs count (1-2), so this is
    # also bandwidth-optimal.
    outer = S[:, 0][:, None] * Xm[:, 0][None, :]
    for k in range(1, S.shape[1]):
        outer = outer + S[:, k][:, None] * Xm[:, k][None, :]
    Kbar = ldbar * Kinv - outer
    Bbar = S.reshape(Xbar.shape)
    return Kbar, Bbar


_mp_sal.defvjp(_mp_sal_fwd, _mp_sal_bwd)


def sharded_mp_solve_and_logdet(K, B, mesh, axis_name="shard", block=512,
                                n_refine=DEFAULT_REFINE_ITERS):
    """(K^{-1} B, log det K) to ~f64 accuracy with one f64 (n, n) matmul.

    K row-sharded over the mesh (or replicated on a 1-device mesh); B is
    (n,) or (n, m) with small m.  Differentiable via the analytic custom
    VJP above.  Non-PD or f32-intractable K yields NaN outputs, which
    the criterion wrappers map to +inf.
    """
    if not _single_device(mesh, axis_name):
        K = jax.device_put(K, NamedSharding(mesh, P(axis_name, None)))
    return _mp_sal(mesh, axis_name, block, n_refine, K, B)
