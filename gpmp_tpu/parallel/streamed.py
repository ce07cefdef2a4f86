# gpmp_tpu/parallel/streamed.py
"""Single-chip large-n mixed engine with the f64 covariance STREAMED.

Breaks the single-chip HBM wall (round-3 VERDICT item 2): the resident
mixed engine (parallel/mixed.py) holds the f64 (n, n) covariance plus
its backward residuals, which tops out at n=16384 on a 16 GB v5e
(n=24576 compiles to 30 GB).  This engine never materializes K in
float64.  Same mathematics as parallel/mixed.py -- f32 Cholesky
preconditioner, factorization-residual logdet identity, refined solves,
analytic custom VJP -- but the operator is a function of
``(covparam, B)`` with the covariance evaluated from the KERNEL in
bounded row/column blocks:

  value:  log det K = 2 sum log diag L32 + log det(I + M R M^T),
          R = K - L32 L32^T streamed in column panels (f64 kernel rows
          per panel, row-chunked emulated-f64 panel products);
  solves: f32-preconditioner refinement where each f64 residual matvec
          K @ X reads a two-float representation of K (ff mode) or
          recomputes f64 kernel rows (recompute mode);
  grad:   Kbar = ldbar * Kinv - S X^T is never materialized in f64;
          Kinv is built f32 row-chunk-wise and the <Kbar, dK/dtheta>
          contraction streams through the f32 kernel chain
          (row-chunked with f64 cross-chunk accumulation, as
          parallel/likelihood.py's chunked gram pullback).  Gradient
          envelope: ~1e-5 relative per component (class envelope of the
          f32 Kinv-series + f32 kernel-chain contraction; measured on
          hardware vs an independent FD oracle at n=1536/8192/24576,
          BENCHMARKS.md gradient-envelope table, artifact
          PARITY_24576_GRAD_r05.json), with worst case <=1e-4 for
          cancellation-amplified components (e.g. log-sigma2 near an
          optimum).  Measured at the SAME level on the resident mixed
          engine, so this engine matches the class envelope rather
          than degrading it; applications needing ~1e-8 gradients use
          the f64 engine.

Two storage modes, chosen by a peak-bytes model against device memory:

- ``ff`` (float-float): K is resident as (K32, E32) with
  E32 = f32(K64 - K32) -- same bytes as one f64 copy but no f64 gram
  temps and no emulated-f64 split expansions at matvec time (the
  fused multiply+f64-reduce promotes in registers).  Representation
  error ~eps32^2 |K| ~ 4e-15 relative: one f64 kernel pass per
  evaluation, matvecs at f32 HBM bandwidth.  Peak ~5.5 n^2 f32 words.
- ``recompute``: only K32 stays resident; every f64 matvec re-streams
  the kernel in f64 row chunks.  Exact f64 kernel values; costs ~5-7
  kernel passes per value+grad.  Measured peak 4.03 n^2 f32 words
  (round-5 XLA dump) -- the mode that reaches n=28672 on one 16 GB
  chip (measured green, PARITY_28672_r05.json); n=32768 needs
  16.15 GB > 15.75 GB available and is measured-impossible
  single-chip (BENCHMARKS.md budget table) -- use a >=2-chip mesh.

Single-device only (the multi-device path shards K across aggregate
HBM instead -- parallel/mixed.py).  Requires a dtype-polymorphic
kernel (f32 inputs -> f32 gram), checked by the dispatcher in
parallel/likelihood.py.  No reference counterpart (the reference is
CPU-resident dense LAPACK, /root/reference/gpmp/core/likelihood.py);
this is the TPU-native continuation of its exact-GP semantics.
"""

import math
import os

import jax
import jax.numpy as jnp
from jax import lax

from gpmp_tpu.ops.mixed import _block_tri_inv
from .mixed import (
    DEFAULT_REFINE_ITERS,
    _RIDGE_FACTOR,
    _SOLVE_RTOL2,
)

# Series/robust gate on c4 = tr(H^4) = sum(lambda^4), NOT on
# c2 = |H|_F^2 (parallel/mixed's gate): c2 aggregates n^2 eps32-level
# entries, so a healthy large-n H crosses an absolute c2 bound with the
# series nowhere near divergence (measured: NaN value at n=24576 on a
# well-conditioned K).  c4 is dominated by the largest eigenvalues:
# truncation |sum lambda^5| <= c4^1.25, so c4 < 1e-6 bounds the value
# error at ~4e-9 absolute and max|lambda| <= 0.03 (deep inside
# convergence); the backward Kinv truncation is |lambda|^3 ~ 3e-5
# relative, inside the gradient envelope.
_SERIES_C4_TAU = 1e-6

# stream only where the resident engine cannot go (it is faster when it
# fits).  GPMP_STREAM_N forces an explicit cutover n for tests/tuning;
# unset (the default) the cutover derives from the RESIDENT engine's
# measured peak-bytes model against the device cap, so the old fixed
# n=20480 gap (16384 < n < 20480 routed to a resident compile that
# OOMs -- ADVICE r4) cannot occur.  Read at trace time: recompile
# (or re-jit) after changing it.
_env_stream_n = os.environ.get("GPMP_STREAM_N")
STREAM_MIN_N = int(_env_stream_n) if _env_stream_n else None

# Resident mixed engine's peak liveness in (n, n)-f32 units, calibrated
# against XLA's buffer assignment: 30 GB at n=24576 (round-4 dump)
# = 13.3 units; 0.2 headroom for per-size layout variance.
_RESIDENT_PEAK_UNITS = 13.5


def _resident_fits(n, cap_bytes=None):
    cap = _device_bytes_cap() if cap_bytes is None else cap_bytes
    return _RESIDENT_PEAK_UNITS * 4 * n * n <= cap

_F64 = jnp.float64
_F32 = jnp.float32


def _largest_divisor_leq(n, bound):
    best = 1
    i = 1
    while i * i <= n:
        if n % i == 0:
            for c in (i, n // i):
                if best < c <= bound:
                    best = c
        i += 1
    return best


def _device_bytes_cap():
    """~85% of one device's memory; generous fallback off-TPU."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return int(0.85 * limit)
    except Exception:
        pass
    if jax.devices()[0].platform == "tpu":
        return int(0.85 * 16 * 1024 ** 3)
    return 1 << 62          # CPU hosts: RAM-bound, not our concern


def choose_mode(n, cap_bytes=None):
    """('ff' | 'recompute' | None) by a peak-bytes model.

    The unit is one (n, n) f32 buffer.  Coefficients are calibrated
    against XLA:TPU's actual buffer assignment at n=24576 (measured
    round 4): liveness ~6.5 units for ff / ~3 for recompute, PLUS
    ~50% slack for the layout copies (cholesky wants column-major,
    the streamed builds produce row-major) and arena fragmentation the
    2+ GB buffers induce (measured 7.3 GB of fragmentation on a
    14.6 GB unpadded ff value program)."""
    unit = 4 * n * n
    cap = _device_bytes_cap() if cap_bytes is None else cap_bytes
    if 9.0 * unit <= cap:
        return "ff"
    # recompute coefficient 4.2: XLA's measured value-program peak at
    # n=32768 is 4.03 units (round-5 dump, artifacts/probe32k_r05.err)
    # and n=28672 value+grad runs green on a 15.75 GB v5e; 32768 is
    # measured-impossible on one chip (16.15 GB needed -- intrinsic
    # {M, R, H} residents are 3 units and XLA scheduling adds ~1).
    if 4.2 * unit <= cap:
        return "recompute"
    return None


def _robust_fits(n, cap_bytes=None):
    """The second-level logdet branch adds F/MF (2 units) on top of the
    base residents; buffer assignment sizes the arena to the max over
    cond branches, so past ~6.5 units the engine degrades to
    series-or-NaN (criterion wrappers map NaN to +inf, the reference's
    failure semantics)."""
    cap = _device_bytes_cap() if cap_bytes is None else cap_bytes
    return 6.5 * 4 * n * n <= cap


def _level2_tau(n):
    """Scale-aware divergence gate for the second-level logdet defect:
    accept when rms(G) <= 1e-6 (~15x eps32 -- a healthy second level
    sits at eps32-rms, a failed one orders of magnitude above).  The
    round-3 ABSOLUTE gate (|G|_F^2 < 1e-8) spuriously rejected every
    healthy large-n robust evaluation: |G|_F^2 aggregates n^2
    eps32-level entries, ~2e-5 at n=8192.  Truncation error of the
    quadratic correction is ~|G|_2 * g2 ~ eps32 * g2 -- negligible at
    this gate."""
    return 1e-12 * n * n


# --------------------------------------------------------------------------
# streamed kernel evaluation
# --------------------------------------------------------------------------

def _diag_correction(model, covparam, xi):
    from .likelihood import _diag_correction as _dc

    return _dc(model, covparam, xi)


def _defeat_identity(x):
    """y that is elementwise x but fails the kernel's `y is x` test."""
    return x + jnp.zeros_like(x)


def _gram_rows(model, p, x_rows, x_full, corr_rows, row0, n):
    """(chunk, n) covariance rows incl. the self-branch diagonal."""
    Kr = model.covariance(x_rows, x_full, p)
    chunk = x_rows.shape[0]
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    grow = row0 + jnp.arange(chunk, dtype=jnp.int32)[:, None]
    return Kr + jnp.where(col == grow, corr_rows[:, None].astype(Kr.dtype),
                          0.0)


def _diag_self_mean(model, p, xi, chunk):
    """mean(diag K) from the SELF-branch covariance in O(n chunk):
    diag(K_full) == diag(K_self) by construction (the full gram is
    cross-branch + corr with corr = diag(K_self) - diag(K_cross)).
    Lets the Cholesky ridge be known BEFORE the K32 build, so recompute
    mode can fold it into the build and hand cholesky K32 itself --
    the post-build `K32 + ridge*I` select was a dedicated (n, n) f32
    temp (4 GB of the 1.39 GB-over n=32768 OOM, round-5 buffer dump)."""
    n, d = xi.shape
    nb = n // chunk

    def one(xblk):
        return jnp.diagonal(model.covariance(xblk, xblk, p))

    diag = jax.vmap(one)(xi.reshape(nb, chunk, d)).reshape(-1)
    return jnp.mean(diag)


def _build_k32(model, p, xi, corr, chunk, ridge=None):
    """Resident K32 = f32 ROUNDING of the f64 gram (one streamed f64
    kernel pass, hi word only), with an optional Cholesky ridge folded
    into the diagonal AT BUILD TIME (recompute mode only: there K32
    feeds nothing but the factorization, while ff mode's resident pair
    is the engine's K representation and must stay unridged).

    NOT the f32 kernel chain: an f32-kernel K32 differs from f32(K64)
    by ~1e-6 absolute (f32 distance computation), which inflates the
    factorization residual R = K - L L^T tenfold -- enough to push
    |H|_F^2 past the series gate at n >= 8192 and strand healthy
    evaluations on the robust branch (the round-4 recompute-mode NaN).
    The f64 pass restores the eps32-level R the engine's accuracy
    model assumes; its cost is one kernel pass the recompute mode
    already pays per matvec."""
    n, d = xi.shape
    xc = _defeat_identity(xi)
    nb = n // chunk

    def body(i, buf):
        r0 = i * chunk
        z = r0 * 0                      # zero of the loop-counter dtype
        x_rows = lax.dynamic_slice(xi, (r0, z), (chunk, d))
        c_rows = lax.dynamic_slice(corr, (r0,), (chunk,))
        k64 = _gram_rows(model, p, x_rows, xc, c_rows, r0, n)
        k32 = k64.astype(_F32)
        if ridge is not None:
            col = jnp.arange(n, dtype=jnp.int32)[None, :]
            grow = r0 + jnp.arange(chunk, dtype=jnp.int32)[:, None]
            k32 = k32 + jnp.where(col == grow, ridge.astype(_F32), 0.0)
        return lax.dynamic_update_slice(buf, k32, (r0, z))

    return lax.fori_loop(0, nb, body, jnp.zeros((n, n), _F32))


def _build_ff(model, p, xi, corr, chunk):
    """(K32, E32) float-float split of the f64 gram, one streamed f64
    kernel pass; K64 never materializes beyond one row chunk.

    fori_loop + dynamic-update-slice into the final (n, n) buffers
    instead of lax.map + reshape: the map's stacked (nb, chunk, n)
    accumulator picked a layout the (n, n) consumers could not bitcast,
    costing one full extra copy of EACH output (4.5 GB at n=24576);
    the loop carries update in place."""
    n, d = xi.shape
    xc = _defeat_identity(xi)
    nb = n // chunk

    def body(i, bufs):
        hi_b, lo_b = bufs
        r0 = i * chunk
        z = r0 * 0                      # zero of the loop-counter dtype
        x_rows = lax.dynamic_slice(xi, (r0, z), (chunk, d))
        c_rows = lax.dynamic_slice(corr, (r0,), (chunk,))
        k64 = _gram_rows(model, p, x_rows, xc, c_rows, r0, n)
        hi = k64.astype(_F32)
        lo = (k64 - hi.astype(_F64)).astype(_F32)
        hi_b = lax.dynamic_update_slice(hi_b, hi, (r0, z))
        lo_b = lax.dynamic_update_slice(lo_b, lo, (r0, z))
        return hi_b, lo_b

    return lax.fori_loop(
        0, nb, body,
        (jnp.zeros((n, n), _F32), jnp.zeros((n, n), _F32)),
    )


def _k64_col_slab_recompute(model, p, xi, corr, c0, cb):
    """K64[c0:, c0:c0+cb] from the f64 kernel (one column panel of the
    residual pass).  Static python slice bounds (the panel loop is
    unrolled)."""
    n = xi.shape[0]
    x_rows = xi[c0:]
    x_cols = _defeat_identity(xi[c0:c0 + cb])
    Ks = model.covariance(x_rows, x_cols, p)
    # self-branch diagonal hits rows [c0, c0+cb) of this slab
    dcorr = jnp.zeros((n - c0, cb), Ks.dtype).at[
        jnp.arange(cb), jnp.arange(cb)
    ].add(corr[c0:c0 + cb].astype(Ks.dtype))
    return Ks + dcorr


def _k64_col_slab_ff(K32, E32, c0, cb):
    """Column slab via a ROW slab + transpose: K is exactly symmetric
    (every (i, j) entry is computed by the same fp operations as
    (j, i) in the row-streamed build), and column slices of the
    row-major residents forced a full {0,1} layout copy of BOTH K32
    and E32 (4.5 GB at n=24576, round-4 buffer dump); the per-panel
    (cb, n-c0) transpose is a bounded temp instead."""
    kr = K32[c0:c0 + cb, c0:].astype(_F64)
    er = E32[c0:c0 + cb, c0:].astype(_F64)
    return (kr + er).T


# --------------------------------------------------------------------------
# streamed factorization residual
# --------------------------------------------------------------------------

def _streamed_residual_f32(k64_slab, L32, n, block, rc):
    """R = K - L32 L32^T in f64 arithmetic, f32 result, K streamed.

    Column-panel structure of ops/mixed._factorization_residual_f32
    (lower-triangular panels only, ~n^3/3 emulated-f64 MACs), with the
    panel product row-chunked (inner lax.map) so no emulated-f64 dot
    ever sees an operand larger than (rc, c1) or (block, c1): the
    split-operand expansion (8 f32 words per f64 entry) stays capped at
    ~8 * rc * n words instead of the 8 * n^2/4 a mid-size panel would
    hoist (the n=24576 killer).  k64_slab(c0, width) -> f64
    (n - c0, width)."""
    hp = jax.lax.Precision.HIGHEST
    nb = n // block
    if nb <= 1:
        K64 = k64_slab(0, n)
        L64 = L32.astype(_F64)
        return (K64 - jnp.dot(L64, L64.T, precision=hp)).astype(_F32)
    # R is assembled SYMMETRIC in one (n, n) buffer by per-panel
    # dynamic-update-slices: panel j writes its (n-c0, block) column
    # block at (c0, c0) and the mirrored (block, n-c1) row block at
    # (c0, c1) via a BOUNDED per-panel transpose.  The round-4 form
    # (concat panels -> tril -> add full transpose) held two extra
    # (n, n) layout/select temps -- 8 GB of the n=32768 OOM
    # (round-5 buffer dump).  The panel's leading (block, block)
    # diagonal part is symmetric by construction (Ks diag block and
    # L[c0:c1,:c1] L[c0:c1,:c1]^T both are), so the two writes agree.
    R = jnp.zeros((n, n), _F32)
    for j in range(nb):
        c0, c1 = j * block, (j + 1) * block
        Ks = k64_slab(c0, block)                   # (n - c0, block) f64
        Lp64 = L32[c0:c1, :c1].astype(_F64)        # (block, c1) f64
        rows = n - c0
        rcj = rc if rows % rc == 0 else math.gcd(rows, rc)
        nrc = rows // rcj
        Lr = L32[c0:, :c1].reshape(nrc, rcj, c1)

        def _rchunk(l_rows32, _L=Lp64):
            return jnp.dot(l_rows32.astype(_F64), _L.T, precision=hp)

        LLt = lax.map(_rchunk, Lr).reshape(rows, block)
        p = (Ks - LLt).astype(_F32)
        R = lax.dynamic_update_slice(R, p, (c0, c0))
        if c1 < n:
            R = lax.dynamic_update_slice(R, p[block:, :].T, (c0, c1))
    return R


# --------------------------------------------------------------------------
# H = M R M^T (column-blocked), trace series without materializing H^2
# --------------------------------------------------------------------------

def _h_from_residual(M32, R32, cb):
    """H = (M32 R32) M32^T built in ROW blocks: the stacked (nb, cb, n)
    map output reshapes to row-major (n, n) as a bitcast, where the
    round-4 column-block variant's final transpose materialized a full
    (n, n) layout copy (2.25 GB at n=24576).  Same 2 n^3 f32 MXU MACs;
    the M32^T contraction is expressed via einsum so XLA folds the
    transpose into the dot."""
    n = M32.shape[0]
    nb = n // cb

    def one(j):
        Mr = lax.dynamic_slice(M32, (j * cb, jnp.int32(0)), (cb, n))
        t = jnp.einsum("in,nm->im", Mr, R32,
                       precision=jax.lax.Precision.HIGHEST)   # (cb, n)
        return jnp.einsum("im,km->ik", t, M32,
                          precision=jax.lax.Precision.HIGHEST)

    rows = lax.map(one, jnp.arange(nb, dtype=jnp.int32))      # (nb, cb, n)
    return rows.reshape(n, n)


def _h_traces(H, chunk):
    """(c1, c2, c3, c4) = (tr H, tr H^2, tr H^3, ~tr H^4) with H^2 kept
    to one row chunk.  c4 uses |H^2|_F^2 (== tr H^4 up to the eps32^2
    asymmetry of the computed H -- far below the c4/4 term's own
    truncation budget)."""
    n = H.shape[0]
    hp = jax.lax.Precision.HIGHEST
    nb = n // chunk

    def body(carry, i):
        c1, c2, c3, c4 = carry
        r0 = i * chunk
        Hr = lax.dynamic_slice(H, (r0, jnp.int32(0)), (chunk, n))
        Hc = lax.dynamic_slice(H, (jnp.int32(0), r0), (n, chunk))
        H2r = jnp.dot(Hr, H, precision=hp)
        HcT = Hc.T
        idx = jnp.arange(chunk)
        c1 = c1 + jnp.sum(Hr[idx, r0 + idx].astype(_F64))
        c2 = c2 + jnp.sum(Hr.astype(_F64) * HcT.astype(_F64))
        c3 = c3 + jnp.sum(H2r.astype(_F64) * HcT.astype(_F64))
        c4 = c4 + jnp.sum(H2r.astype(_F64) * H2r.astype(_F64))
        return (c1, c2, c3, c4), None

    z = jnp.float64(0.0)
    (c1, c2, c3, c4), _ = lax.scan(
        body, (z, z, z, z), jnp.arange(nb, dtype=jnp.int32)
    )
    return c1, c2, c3, c4


def _plain_f32_tri_pair(E32):
    from .mixed import _plain_f32_tri_pair as _pair

    return _pair(E32)


def _streamed_level2_g(H, MF32, cb):
    """(tr G, |G|_F^2), G = MF (I + H) MF^T - I, fused per COLUMN block:
    each T[:, cols] = (I + H) MF[cols, :]^T is built once, consumed
    once (G[:, cols] = MF T[:, cols] - I[:, cols]), so no (n, n) f64 is
    ever resident -- unlike round 3's row-major stream, which kept the
    full T (n^2 f64, itself an OOM at n >= 24576 in compile-both-
    branches cond arithmetic).  f64 sandwich for the same cancellation
    reason as the dense form; inner dots blocked so split expansions
    stay at ~8 n cb words."""
    n = H.shape[0]
    hp = jax.lax.Precision.HIGHEST
    nb = n // cb

    def body(carry, j):
        g1, g2 = carry
        c0 = j * cb
        mfc = lax.dynamic_slice(MF32, (c0, jnp.int32(0)), (cb, n))      # MF rows
        mfc64t = mfc.astype(_F64).T                          # (n, cb)

        def _hrow(i):
            Hr = lax.dynamic_slice(H, (i * cb, jnp.int32(0)), (cb, n)).astype(_F64)
            return jnp.dot(Hr, mfc64t, precision=hp)         # (cb, cb)

        T_cb = (lax.map(_hrow, jnp.arange(nb, dtype=jnp.int32))
                .reshape(n, cb) + mfc64t)

        def _mfrow(i):
            Mr = lax.dynamic_slice(MF32, (i * cb, jnp.int32(0)), (cb, n)).astype(_F64)
            return jnp.dot(Mr, T_cb, precision=hp)           # (cb, cb)

        G_cb = lax.map(_mfrow, jnp.arange(nb, dtype=jnp.int32)) \
            .reshape(n, cb)
        col = c0 + jnp.arange(cb)
        row = jnp.arange(n)
        eye_cb = (row[:, None] == col[None, :]).astype(_F64)
        G_cb = G_cb - eye_cb
        g1 = g1 + jnp.sum(G_cb * eye_cb)
        g2 = g2 + jnp.sum(G_cb * G_cb)
        return (g1, g2), None

    (g1, g2), _ = lax.scan(
        body, (jnp.float64(0.0), jnp.float64(0.0)),
        jnp.arange(nb, dtype=jnp.int32),
    )
    return g1, g2


# --------------------------------------------------------------------------
# refined solves with streamed matvec
# --------------------------------------------------------------------------

def _matvec_ff(K32, E32, X, chunk=1024):
    """K @ X with K = K32 + E32: broadcast-multiply + f64 tree reduction
    per part (the parallel/mixed._f64_matvec idea applied to the
    two-float representation), ROW-CHUNKED: on TPU the emulation pass
    materializes an unfused f32*f64 broadcast product as a full (n, n)
    f64 (two u32 words -- 4.5 GB at n=24576, measured round 4), so the
    promotion must be bounded to one (chunk, n) block."""
    n = K32.shape[0]
    c = chunk if n % chunk == 0 else _largest_divisor_leq(n, chunk)
    nb = n // c
    squeeze = X.ndim == 1
    Xm = X.reshape(-1, 1) if squeeze else X

    def rows(i):
        r0 = i * c
        Kr = lax.dynamic_slice(K32, (r0, jnp.int32(0)), (c, n))
        Er = lax.dynamic_slice(E32, (r0, jnp.int32(0)), (c, n))
        cols = [
            jnp.sum(Kr * Xm[None, :, j], axis=1, dtype=_F64)
            + jnp.sum(Er * Xm[None, :, j], axis=1, dtype=_F64)
            for j in range(Xm.shape[1])
        ]
        return jnp.stack(cols, axis=1)

    out = lax.map(rows, jnp.arange(nb, dtype=jnp.int32)).reshape(
        n, Xm.shape[1]
    )
    return out.reshape(-1) if squeeze else out


def _matvec_recompute(model, p, xi, corr, chunk, X):
    """K @ X with f64 kernel rows re-streamed (one pass per call)."""
    n, d = xi.shape
    xc = _defeat_identity(xi)
    nb = n // chunk
    squeeze = X.ndim == 1
    Xm = X.reshape(-1, 1) if squeeze else X

    def body(args):
        x_rows, c_rows, i = args
        Kr = _gram_rows(model, p, x_rows, xc, c_rows, i * chunk, n)
        cols = [jnp.sum(Kr * Xm[None, :, j], axis=1)
                for j in range(Xm.shape[1])]
        return jnp.stack(cols, axis=1)

    out = lax.map(body, (xi.reshape(nb, chunk, d),
                         corr.reshape(nb, chunk),
                         jnp.arange(nb, dtype=jnp.int32)))
    out = out.reshape(n, Xm.shape[1])
    return out.reshape(-1) if squeeze else out


def _apply_precond(M32, R64):
    hp = jax.lax.Precision.HIGHEST
    r32 = R64.astype(_F32)
    c32 = jnp.dot(M32.T, jnp.dot(M32, r32, precision=hp), precision=hp)
    return c32.astype(R64.dtype)


def _refined_solve_streamed(matvec, B, M32, n_refine):
    """parallel/mixed._refined_solve's early-exit while_loop with the
    f64 residual matvec abstracted (single-device only)."""
    squeeze = B.ndim == 1
    Bm = B.reshape(-1, 1) if squeeze else B
    bb = jnp.maximum(jnp.sum(Bm * Bm), jnp.finfo(_F64).tiny)
    X = _apply_precond(M32, Bm)
    R = Bm - matvec(X)
    floor2 = 1e-24

    def _not_done(carry):
        _X, _R, r2, r2_prev, it = carry
        return (r2 >= floor2) & (r2 < 0.25 * r2_prev) & (it < n_refine)

    def _sweep(carry):
        X_, R_, r2, _r2p, it = carry
        X_ = X_ + _apply_precond(M32, R_)
        R_ = Bm - matvec(X_)
        return X_, R_, jnp.sum(R_ * R_) / bb, r2, it + 1

    r2_0 = jnp.sum(R * R) / bb
    X, R, _, _, _ = jax.lax.while_loop(
        _not_done, _sweep,
        (X, R, r2_0, jnp.full((), jnp.inf, r2_0.dtype), jnp.int32(0)),
    )
    rel2 = jnp.sum(R * R) / bb
    X = jnp.where(rel2 < _SOLVE_RTOL2, X, jnp.nan)
    return X.reshape(-1) if squeeze else X


# --------------------------------------------------------------------------
# backward pieces
# --------------------------------------------------------------------------

def _kinv_series_rows(M32, H, chunk):
    """Kinv ~= M^T (I - H + H^2) M built row-chunk-wise: per chunk
    t1 = (M^T)[rows] H, t2 = t1 H, Kinv[rows] = (M^T[rows] - t1 + t2) M.
    3 n^3 f32 MACs, peak extra memory one (chunk, n) block."""
    n = M32.shape[0]
    hp = jax.lax.Precision.HIGHEST
    nb = n // chunk

    def one(i):
        Mc = lax.dynamic_slice(M32, (jnp.int32(0), i * chunk), (n, chunk))
        MtR = Mc.T                                  # (chunk, n) of M^T
        t1 = jnp.dot(MtR, H, precision=hp)
        t2 = jnp.dot(t1, H, precision=hp)
        return jnp.dot(MtR - t1 + t2, M32, precision=hp)

    rows = lax.map(one, jnp.arange(nb, dtype=jnp.int32))
    return rows.reshape(n, n)


def _kinv_robust(M32, H):
    """Kinv ~= (MF M)^T (MF M) -- second-level preconditioner."""
    hp = jax.lax.Precision.HIGHEST
    n = H.shape[0]
    _F, MF32 = _plain_f32_tri_pair(jnp.eye(n, dtype=_F32) + H)
    W = jnp.dot(MF32, M32, precision=hp)
    return jnp.dot(W.T, W, precision=hp)


def _streamed_param_pullback(model, p32, xi32, Kinv32, S32, X32, ldbar32,
                             chunk):
    """grad_p <Kbar, K(p)> with Kbar = ldbar Kinv - S X^T formed one row
    chunk at a time inside the f32 kernel-chain pullback -- Kbar itself
    never materializes (parallel/likelihood._chunked_gram_pullback with
    the cotangent fused in).  Per-chunk d-dim gradients are accumulated
    in FLOAT64 across chunks (round-5: removes the sqrt(nb) cross-chunk
    eps32 compounding); intra-chunk products stay f32."""
    n, d = xi32.shape
    nb = n // chunk
    xc = _defeat_identity(xi32)
    diag_kinv = jnp.diagonal(Kinv32)
    diag_sxt = jnp.sum(S32 * X32, axis=1)
    diag_bar = ldbar32 * diag_kinv - diag_sxt

    def blk(carry, xs):
        x_rows, kinv_rows, s_rows = xs
        kb = ldbar32 * kinv_rows - jnp.dot(
            s_rows, X32.T, precision=jax.lax.Precision.HIGHEST
        )

        def chunk_loss(p):
            Kr = model.covariance(x_rows, xc, p)
            return jnp.sum(kb * Kr.astype(kb.dtype))

        g = jax.grad(chunk_loss)(p32)
        return carry + g.astype(jnp.float64), None

    g_cross, _ = lax.scan(
        blk,
        jnp.zeros(p32.shape, jnp.float64),
        (xi32.reshape(nb, chunk, d),
         Kinv32.reshape(nb, chunk, n),
         S32.reshape(nb, chunk, S32.shape[1])),
    )

    def diag_loss(p):
        corr = _diag_correction(model, p, xi32)
        return jnp.sum(diag_bar * corr.astype(diag_bar.dtype))

    return g_cross + jax.grad(diag_loss)(p32).astype(jnp.float64)


# --------------------------------------------------------------------------
# the operator
# --------------------------------------------------------------------------

def make_streamed_sal(model, xi, mode=None, n_refine=DEFAULT_REFINE_ITERS,
                      robust=None, cap_bytes=None):
    """(covparam, B) -> (K^{-1} B, log det K), custom VJP, K streamed.

    model/xi close over the operator (xi is data -- not differentiated;
    the VJP returns cotangents for covparam and B only).  mode/robust
    default from the device-memory model; see module docstring.
    """
    n, d = xi.shape
    if mode is None:
        mode = choose_mode(n, cap_bytes)
    if mode is None:
        raise ValueError(
            f"streamed engine: n={n} does not fit this device even in "
            "recompute mode; use a multi-device mesh (parallel/)."
        )
    if robust is None:
        robust = _robust_fits(n, cap_bytes)
    chunk = _largest_divisor_leq(n, 512)
    # narrower residual panels past 16k: the panel product's hoisted
    # split-operand expansion scales as 8 * rblock * n words
    # (256 at n>=32k measured WORSE in the round-5 dump: more live
    # panel temps, slower compile -- keep 512)
    rblock = _largest_divisor_leq(n, 512 if n >= 16384 else 1024)
    cb = _largest_divisor_leq(n, 256)
    if chunk < 64:
        raise ValueError(
            f"streamed engine needs a divisor of n={n} in [64, 512] "
            "for row chunking; pad n or use the resident engine."
        )
    xi = jnp.asarray(xi)
    xi32 = xi.astype(_F32)

    def _forward(p, B):
        corr = _diag_correction(model, p, xi)
        if mode == "ff":
            K32, E32 = _build_ff(model, p, xi, corr, chunk)

            def k64_slab(c0, width):
                return _k64_col_slab_ff(K32, E32, c0, width)

            def matvec(X):
                return _matvec_ff(K32, E32, X)
        else:
            # recompute mode: K32 feeds only the factorization, so the
            # Cholesky ridge (computed from the O(n) analytic diagonal,
            # _diag_self_mean) is folded into the build -- the
            # post-build `K32 + ridge*I` select was a dedicated (n, n)
            # temp, 4 GB of the n=32768 OOM (round-5 buffer dump).
            ridge_pre = _RIDGE_FACTOR * jnp.finfo(_F32).eps * (
                _diag_self_mean(model, p, xi, chunk)
            )
            K32 = _build_k32(model, p, xi, corr, chunk, ridge=ridge_pre)
            E32 = None

            def k64_slab(c0, width):
                return _k64_col_slab_recompute(model, p, xi, corr, c0,
                                               width)

            def matvec(X):
                return _matvec_recompute(model, p, xi, corr, chunk, X)

        # cholesky's custom-call wants a column-major operand while the
        # streamed build (and every other consumer) is row-major; the
        # layout ping-pong cost two full (n, n) copies and 9 GB of
        # arena fragmentation at n=24576 (round-4 buffer dump).  K32 is
        # exactly symmetric, so hand cholesky the TRANSPOSE -- XLA
        # folds the transpose of a row-major buffer into the {0,1}
        # layout the custom-call wants, no copy.
        if mode == "ff":
            ridge = _RIDGE_FACTOR * jnp.finfo(_F32).eps * (
                jnp.trace(K32) / n
            )
            chol_in = (K32 + ridge * jnp.eye(n, dtype=_F32)).T
        else:
            chol_in = K32.T               # ridge already folded in
        L32 = jnp.linalg.cholesky(chol_in)
        # reduce the logdet base IMMEDIATELY: consuming diag(L32) at the
        # very end gave XLA's rematerializer an incentive to recompute
        # the whole cholesky select late, pinning K32 alive through the
        # entire program (round-5 n=32768 dump: select_n ... remat4)
        base = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L32).astype(_F64)))
        # residual BEFORE the triangular inverse: R needs L32 but not
        # M32, so this order keeps peak liveness at {L32, R} then
        # {L32, M32, R} (3 units) instead of carrying M32 through the
        # whole panel stream -- the difference between fitting and
        # OOMing at n=32768 (19.0 GB unpadded peak, round-4 dump)
        R32 = _streamed_residual_f32(k64_slab, L32, n, rblock,
                                     _largest_divisor_leq(rblock, 512))
        M32 = _block_tri_inv(L32, base=128)
        H = _h_from_residual(M32, R32, cb)
        c1, c2, c3, c4 = _h_traces(H, chunk)
        ld_series = base + c1 - c2 / 2.0 + c3 / 3.0 - c4 / 4.0

        if robust:
            def _robust_ld(ops):
                H_, = ops
                F32, MF32 = _plain_f32_tri_pair(
                    jnp.eye(n, dtype=_F32) + H_
                )
                g1, g2 = _streamed_level2_g(H_, MF32, cb)
                ld2 = (base
                       + 2.0 * jnp.sum(
                           jnp.log(jnp.diagonal(F32).astype(_F64)))
                       + g1 - g2 / 2.0)
                return jnp.where(g2 < _level2_tau(n), ld2, jnp.nan)

            def _series_ld(ops):
                return ld_series

            # NaN c4 compares False -> robust -> NaN (as parallel/mixed)
            ld = lax.cond(c4 < _SERIES_C4_TAU, _series_ld, _robust_ld,
                          (H,))
        else:
            ld = jnp.where(c4 < _SERIES_C4_TAU, ld_series, jnp.nan)

        X = _refined_solve_streamed(matvec, B, M32, n_refine)
        if mode == "ff":
            # the ff matvec reads the resident two-float K in backward
            res_k = (K32, E32)
        else:
            # recompute-mode backward re-streams the kernel: saving K32
            # would hold a dead (n, n) unit through fwd+bwd for nothing
            res_k = (None, None)
        # c4 rides along as a residual: the backward's series/robust
        # gate needs ONLY this scalar, and recomputing it via _h_traces
        # cost a full ~n^3 f32 pass incl. H^2 row products (ADVICE r4)
        return X, ld, (M32, H, X, res_k, c4)

    @jax.custom_vjp
    def sal(p, B):
        X, ld, _ = _forward(p, B)
        return X, ld

    def fwd(p, B):
        X, ld, (M32, H, _X, res_k, c4) = _forward(p, B)
        return (X, ld), (p, M32, H, X, res_k, c4)

    def bwd(res, cot):
        p, M32, H, X, (K32, E32), c4 = res
        Xbar, ldbar = cot
        if mode == "ff":
            # ff backward never evaluates the kernel: no corr needed
            def matvec(V):
                return _matvec_ff(K32, E32, V)
        else:
            corr = _diag_correction(model, p, xi)

            def matvec(V):
                return _matvec_recompute(model, p, xi, corr, chunk, V)

        squeeze = Xbar.ndim == 1
        Xb = Xbar.reshape(-1, 1) if squeeze else Xbar
        Xm = X.reshape(-1, 1) if squeeze else X
        S = _refined_solve_streamed(matvec, Xb, M32, n_refine)

        def _series_inv(ops):
            M32_, H_ = ops
            return _kinv_series_rows(M32_, H_, chunk)

        if robust:
            def _robust_inv(ops):
                M32_, H_ = ops
                return _kinv_robust(M32_, H_)
        else:
            def _robust_inv(ops):
                M32_, H_ = ops
                return jnp.full((n, n), jnp.nan, _F32)

        Kinv32 = lax.cond(c4 < _SERIES_C4_TAU, _series_inv, _robust_inv,
                          (M32, H))
        pbar32 = _streamed_param_pullback(
            model, p.astype(_F32), xi32, Kinv32,
            S.astype(_F32), Xm.astype(_F32),
            ldbar.astype(_F32), chunk,
        )
        Bbar = S.reshape(Xbar.shape)
        return pbar32.astype(p.dtype), Bbar

    sal.defvjp(fwd, bwd)
    return sal


def kernel_is_f32_polymorphic(model, covparam, xi):
    """True when f32 inputs give an f32 gram (the chain the streamed
    pullback and K32 build rerun in f32)."""
    xi32 = jnp.zeros((2, xi.shape[1]), _F32)
    xc32 = jnp.zeros((2, xi.shape[1]), _F32)

    def probe(p32):
        return model.covariance(xi32, xc32, p32)

    try:
        spec = jax.ShapeDtypeStruct(jnp.shape(covparam), _F32)
        return jax.eval_shape(probe, spec).dtype == _F32
    except Exception:
        return False


def streamed_applicable(model, covparam, xi, mesh, axis_name):
    """Dispatcher predicate for parallel/likelihood.py."""
    from .chol import _single_device

    if not _single_device(mesh, axis_name):
        return False
    n = xi.shape[0]
    if xi.dtype != _F64:
        return False
    if STREAM_MIN_N is not None:
        if n < STREAM_MIN_N:
            return False
    elif _resident_fits(n):
        return False          # resident engine fits and is faster
    if _largest_divisor_leq(n, 512) < 64:
        return False
    if choose_mode(n) is None:
        return False
    from gpmp_tpu.core.linalg import chol_engine

    if chol_engine(n) != "mixed":
        return False
    return kernel_is_f32_polymorphic(model, covparam, xi)


def streamed_mp_solve_and_logdet(model, covparam, xi, B,
                                 n_refine=DEFAULT_REFINE_ITERS,
                                 mode=None, robust=None, cap_bytes=None):
    """(K^{-1} B, log det K) with K(covparam; xi) streamed from the
    kernel -- the single-chip beyond-HBM mixed engine.  Differentiable
    in (covparam, B) via the analytic custom VJP; NaN on failure."""
    sal = make_streamed_sal(model, jnp.asarray(xi), mode=mode,
                            n_refine=n_refine, robust=robust,
                            cap_bytes=cap_bytes)
    return sal(jnp.asarray(covparam), B)
