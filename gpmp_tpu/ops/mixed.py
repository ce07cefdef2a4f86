# gpmp_tpu/ops/mixed.py
"""Mixed-precision Cholesky engine: f32 factorization + f64 matmul math.

On this TPU generation float64 is software-emulated: XLA's f64 Cholesky
AND f64 triangular solves are latency-bound (~70 ms at n=1000), while
f32 factorizations and f64 *matmuls* are fast.  This engine therefore
keeps every sequential-triangular operation in f32 and expresses all
f64 work as matrix multiplications:

1.  L32 = chol_f32(K + ridge), ridge ~ 10 eps32 mean(diag) -- the f32
    factor is only a preconditioner, so the ridge costs nothing in
    accuracy but keeps the f32 factorization alive where f64 would
    still succeed.  XLA's f32 Cholesky is used here.  (A VMEM-resident
    Pallas blocked Cholesky -- masked rank-1 panel factorization, MXU
    SYRK updates, even a fused factor+inverse variant -- was built and
    benchmarked against it in-graph with dispatch amortized: XLA won
    at every size that matters, 1.07 vs 1.58 ms at n=1024 and 1.12 vs
    1.86 ms at n=1408 on v5e.  The serial VPU chain of the in-kernel
    panel factorization is the floor, and XLA's own blocked lowering
    has the same structure with better panel code.  The kernel was
    removed; BENCHMARKS.md "Pallas Cholesky postmortem" records the
    numbers.);
2.  M = inv(L32) by an f32 triangular solve, promoted to f64.  Solves
    become matmul applications  x -> M^T (M x);
3.  K x = b by iterative refinement:  x += M^T M (b - K x), with the
    residual in f64.  Each sweep contracts the error by
    O(eps32 cond(K));
4.  log det K = 2 sum log diag L32 + log det(I + H) with
    H = M (K - L L^T) M^T, the factorization-residual form of the
    near-identity defect M K M^T - I: ONE triangular-panel f64 matmul
    (~n^3/3 MACs) instead of the two square ones of E = M K M^T, then
    a quartic trace series in H (or, for ill-conditioned K, a second
    f32 factorization of I + H) brings the truncation error to f64
    roundoff.

All pieces are differentiable JAX ops, so criteria built on this engine
feed jax.value_and_grad directly.  A genuinely non-PD K still surfaces
as NaN (the level-2 f32 factorization fails), which the criterion
wrappers map to +inf.

CONVERGENCE GUARD.  When cond(K) exceeds the f32 dynamic range
(~1e7), refinement stalls and would return finite-but-wrong numbers;
an optimizer exploring such covparams (e.g. noise variance -> 0) would
then converge to a false optimum.  Both entry points therefore check
their own a-posteriori error estimate -- the relative residual
|b - K x| / |b| for solves, |E2 - I|_F for the logdet expansion -- and
replace non-converged outputs with NaN, which the selection-criterion
wrappers map to +inf exactly like a failed f64 Cholesky.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

def is_fwd_mode_error(e):
    """True when e is JAX's refusal to apply forward-mode autodiff to a
    custom_vjp function.

    The engine dispatchers attempt the custom-VJP fast path first and
    catch this trace-time error to retry on a forward-mode-capable
    path (the custom_jvp twins below, or exact f64).  The functions
    are pure, so a failed trace commits nothing.  This replaces round
    2's tracer-attribute introspection (walking .primal/.tangent) with
    the supported failure signal.
    """
    if not isinstance(e, TypeError):
        return False
    # JAX has reworded this error across releases; match the stable
    # vocabulary of the rejection ("can't apply forward-mode autodiff
    # (jvp) to a custom_vjp function" in jax 0.9) rather than one exact
    # phrase.  A bare "jvp" substring is NOT enough (ADVICE r4): an
    # unrelated TypeError mentioning e.g. a user's my_jvp helper would
    # trigger an expensive full f64 retrace before resurfacing, so
    # require the custom_vjp / forward-mode anchor words.
    # test_mixed_engine_forward_mode_fallback pins the wording
    # end-to-end.
    msg = str(e)
    return "custom_vjp" in msg or "forward-mode" in msg


DEFAULT_REFINE_ITERS = 4
_RIDGE_FACTOR = 10.0
# relative-residual^2 acceptance for refined solves: rel < 1e-6
# (converged refinement reaches ~eps64*cond <= 1e-10)
_SOLVE_RTOL2 = 1e-12
# |E2 - I|_F^2 acceptance for the logdet trace expansion: truncation
# error is O(|D2|_F^3), so 1e-8 keeps it below f64 roundoff
_LOGDET_FTOL2 = 1e-8


def _block_tri_inv(L, base=128):
    """Inverse of a lower-triangular matrix by recursive 2x2 blocking.

    [[A, 0], [C, B]]^{-1} = [[A^{-1}, 0], [-B^{-1} C A^{-1}, B^{-1}]],
    applied bottom-up: one batched triangular solve at the base size,
    then log2(n/base) levels of batched matmuls -- MXU-friendly where
    XLA's triangular solve walks sequential panels.  Exact-zeros upper
    triangle by construction, so det(result) = prod(diag) still holds.
    M is used as a preconditioner; recursive inversion's (slightly
    weaker) stability is absorbed by the refinement/series guards.
    """
    n0 = L.shape[0]
    if n0 <= base:
        return solve_triangular(
            L, jnp.eye(n0, dtype=L.dtype), lower=True
        )
    k = 0
    n = base
    while n < n0:
        n *= 2
        k += 1
    if n != n0:
        # Non-power-of-2-multiple-of-base n: an uneven top-level split
        # instead of padding -- padding n=24576 to 32768 costs two
        # 4 GB HLO temps on TPU (round-4 OOM postmortem), 78% more
        # than the matrix itself.  [[A,0],[C,B]]^{-1} with n1 the
        # largest base*2^k < n0: A^{-1}/B^{-1} recurse (A is pow2 by
        # construction; B recurses on the remainder), X = -B^{-1}CA^{-1}
        # two rectangular matmuls.
        n1 = n // 2
        Ai = _block_tri_inv(L[:n1, :n1], base=base)
        Bi = _block_tri_inv(L[n1:, n1:], base=base)
        X = -jnp.dot(Bi, jnp.dot(L[n1:, :n1], Ai))
        # assemble by dynamic-update-slice into one buffer: the concat
        # chain materialized ~1 extra (n, n) of temps at n=24576
        out = jnp.zeros((n0, n0), dtype=L.dtype)
        out = lax.dynamic_update_slice(out, Ai, (0, 0))
        out = lax.dynamic_update_slice(out, X, (n1, 0))
        return lax.dynamic_update_slice(out, Bi, (n1, n1))
    Lp = jnp.eye(n, dtype=L.dtype).at[:n0, :n0].set(L)
    nb = n // base
    Lv = Lp.reshape(nb, base, nb, base)
    idx = jnp.arange(nb)
    diag_blocks = Lv[idx, :, idx, :]  # (nb, base, base)
    eye_b = jnp.eye(base, dtype=L.dtype)
    B = jax.vmap(lambda A: solve_triangular(A, eye_b, lower=True))(
        diag_blocks
    )
    s = base
    for _ in range(k):
        m = B.shape[0] // 2  # pairs at this level
        A_blk = B[0::2]  # (m, s, s) upper-left inverses
        B_blk = B[1::2]  # (m, s, s) lower-right inverses
        Lvv = Lp.reshape(m, 2, s, m, 2, s)
        jdx = jnp.arange(m)
        C = Lvv[jdx, 1, :, jdx, 0, :]  # (m, s, s) off-diagonal of L
        X = -jnp.einsum("bij,bjk->bik", B_blk,
                        jnp.einsum("bij,bjk->bik", C, A_blk))
        z = jnp.zeros_like(A_blk)
        top = jnp.concatenate([A_blk, z], axis=2)
        bot = jnp.concatenate([X, B_blk], axis=2)
        B = jnp.concatenate([top, bot], axis=1)  # (m, 2s, 2s)
        s *= 2
    return B[0][:n0, :n0]


def _f32_preconditioner(K):
    """(L32 promoted to f64, M = L32^{-1} promoted to f64)."""
    n = K.shape[0]
    K32 = K.astype(jnp.float32)
    ridge = _RIDGE_FACTOR * jnp.finfo(jnp.float32).eps * (
        jnp.trace(K32) / n
    )
    K32 = K32 + ridge * jnp.eye(n, dtype=jnp.float32)
    L32 = jnp.linalg.cholesky(K32)
    M32 = _block_tri_inv(L32)
    return L32.astype(K.dtype), M32.astype(K.dtype)


def _f64_matvec(K, X):
    """K @ X for f64 (n, n) K and skinny X, as multiply + f64 reduction.

    XLA's emulated-f64 dot pays its dd-product passes on MXU tiles that
    amortize badly for skinny rhs (measured 12.1 ms for
    (4096, 4096) x (4096, 2) on v5e); the fused broadcast-multiply +
    reduce is bandwidth-bound (3.5 ms, same result: f64 products, f64
    tree reduction -- only the summation order differs).  Wide rhs
    keeps the dot, whose MXU passes then amortize.
    """
    if X.ndim == 1:
        return jnp.sum(K * X[None, :], axis=1)
    if X.shape[1] > 8:
        return jnp.dot(K, X, precision=jax.lax.Precision.HIGHEST)
    cols = [jnp.sum(K * X[None, :, j], axis=1) for j in range(X.shape[1])]
    return jnp.stack(cols, axis=1)


def _factorization_residual_f32(K, L64, block):
    """R = K - L L^T, computed in f64 (the cancellation K ~= L L^T makes
    f64 mandatory) but RETURNED in f32 -- R's downstream consumers
    (H = M R M^T and its traces) are f32 contractions, and R's entries
    carry only ~eps32 * |K| of information to begin with.

    Cost control: R is symmetric and L is lower triangular, so only the
    lower-triangular panels are computed -- panel j is
    K[c0:, c0:c1] - L[c0:, :c1] @ L[c0:c1, :c1]^T, about n^3/3 emulated-
    f64 FLOPs in total (vs 2 n^3 for the dense product, n^3 for the
    column-restricted full-height version).  Each panel is cast to f32
    immediately and the symmetric completion runs in cheap f32
    elementwise ops.  Static Python loop: n/block dots."""
    n = K.shape[0]
    if n % block or n // block <= 1:
        return (
            K - jnp.dot(L64, L64.T, precision=jax.lax.Precision.HIGHEST)
        ).astype(jnp.float32)
    panels = []
    for j in range(n // block):
        c0, c1 = j * block, (j + 1) * block
        p = (
            K[c0:, c0:c1]
            - jnp.dot(L64[c0:, :c1], L64[c0:c1, :c1].T,
                      precision=jax.lax.Precision.HIGHEST)
        ).astype(jnp.float32)
        if c0:
            p = jnp.concatenate(
                [jnp.zeros((c0, block), dtype=jnp.float32), p], axis=0
            )
        panels.append(p)
    Tlow = jnp.concatenate(panels, axis=1)
    # computed entries are exact for row >= panel start; keep r >= c,
    # mirror the strict lower triangle
    Tlow = jnp.tril(Tlow)
    return Tlow + jnp.tril(Tlow, -1).T


def _residual_block(n):
    """Panel width for _factorization_residual_f32: quarters when they
    divide n (the panel restriction then saves ~2/3 of the f64 MACs),
    else the dense fallback inside the helper takes over."""
    return n // 4 if n % 4 == 0 and n >= 512 else n


def _apply(M, R):
    """Preconditioner application M^T (M R), run on the f32 MXU path.

    The refinement only needs the preconditioner's own eps32-level
    accuracy -- the f64 information lives in the residual, which the
    caller computes in f64 -- so both matvecs run in f32.  The f32
    cast of M is a single materialized tensor per compiled program
    (CSE), not a per-apply cost.
    """
    M32 = M.astype(jnp.float32)
    r32 = R.astype(jnp.float32)
    c32 = jnp.dot(M32.T, jnp.dot(M32, r32,
                                 precision=jax.lax.Precision.HIGHEST),
                  precision=jax.lax.Precision.HIGHEST)
    return c32.astype(R.dtype)


def refined_cholesky_solve(K, B, precond=None,
                           n_refine=DEFAULT_REFINE_ITERS,
                           early_exit=False):
    """Solve K X = B to ~f64 accuracy via f32-preconditioned refinement.

    Returns (X, (L, M)) where L is the promoted f32 factor and M its
    inverse (reusable across solves with the same K).

    early_exit=True runs the sweeps in a lax.while_loop that stops when
    the f64 residual hits its floor or stagnates (well-conditioned K
    converges in 1-2 sweeps; n_refine is the cap).  The while_loop is
    not reverse-differentiable, so only the custom-VJP wrappers enable
    it; the default unrolled loop keeps this function traceable by
    plain jax.grad (e.g. through mp_solve_and_inv_diag).
    """
    if precond is None:
        precond = _f32_preconditioner(K)
    L, M = precond
    squeeze = B.ndim == 1
    Bm = B.reshape(-1, 1) if squeeze else B
    bb = jnp.maximum(jnp.sum(Bm * Bm), jnp.finfo(K.dtype).tiny)
    X = _apply(M, Bm)
    R = Bm - _f64_matvec(K, X)
    if early_exit:
        floor2 = 1e-24

        def _not_done(carry):
            _X, _R, r2, r2_prev, it = carry
            return (r2 >= floor2) & (r2 < 0.25 * r2_prev) & (it < n_refine)

        def _sweep(carry):
            X_, R_, r2, _r2p, it = carry
            X_ = X_ + _apply(M, R_)
            R_ = Bm - _f64_matvec(K, X_)
            return X_, R_, jnp.sum(R_ * R_) / bb, r2, it + 1

        r2_0 = jnp.sum(R * R) / bb
        X, R, _, _, _ = jax.lax.while_loop(
            _not_done, _sweep,
            (X, R, r2_0, jnp.full((), jnp.inf, r2_0.dtype), jnp.int32(0)),
        )
    else:
        for _ in range(n_refine):
            X = X + _apply(M, R)
            R = Bm - _f64_matvec(K, X)
    # convergence guard: final relative residual must be tiny, else NaN
    rel2 = jnp.sum(R * R) / bb
    X = jnp.where(rel2 < _SOLVE_RTOL2, X, jnp.nan)
    return (X.reshape(-1) if squeeze else X), precond


def mp_logdet(K, precond):
    """log det K to ~f64 accuracy from the f32 preconditioner.

    Uses the EXACT identity log det K = log det(M K M^T) - 2 log det M
    for the triangular preconditioner M (log det M = sum log diag M --
    exact even though M is only an approximate inverse of the f32
    factor), applied at two levels, with a second-order trace expansion
    at the innermost (near-identity) level.
    """
    n = K.shape[0]
    _L, M = precond
    E = M @ K @ M.T  # near-identity, f64 matmuls
    _L_E, M_E = _f32_preconditioner(E)
    E2 = M_E @ E @ M_E.T
    D2 = E2 - jnp.eye(n, dtype=K.dtype)
    d2norm2 = jnp.sum(D2 * D2)
    corr2 = jnp.trace(D2) - 0.5 * d2norm2
    ld = (
        -2.0 * jnp.sum(jnp.log(jnp.diag(M)))
        - 2.0 * jnp.sum(jnp.log(jnp.diag(M_E)))
        + corr2
    )
    # convergence guard: expansion only valid when E2 is near-identity
    return jnp.where(d2norm2 < _LOGDET_FTOL2, ld, jnp.nan)


def _level2_logdet(E, M):
    """Two-level logdet correction from E = M K M^T (robust path)."""
    n = E.shape[0]
    _L_E, M_E = _f32_preconditioner(E)
    E2 = M_E @ E @ M_E.T
    D2 = E2 - jnp.eye(n, dtype=E.dtype)
    d2norm2 = jnp.sum(D2 * D2)
    corr2 = jnp.trace(D2) - 0.5 * d2norm2
    ld = (
        -2.0 * jnp.sum(jnp.log(jnp.diag(M)))
        - 2.0 * jnp.sum(jnp.log(jnp.diag(M_E)))
        + corr2
    )
    return jnp.where(d2norm2 < _LOGDET_FTOL2, ld, jnp.nan)


# |D|_F^2 threshold for the single-level series logdet: the quartic
# truncation error is bounded by (tr D^2)^{5/2} = 1e-10 at the
# threshold, below the f64 noise floor of an n>=100 logdet
_SERIES_TAU = 1e-4


def _mp_solve_and_logdet_core(n_refine, K, B):
    """Forward pass shared by primal and VJP rules.

    Level-1 pieces: f32 factor L32 and its inverse M, the refined solve
    X, and the near-identity defect H = M (K - L L^T) M^T ~= M K M^T - I
    via the factorization-residual identity -- ONE f64 (n, n) matmul
    (triangular panels, ~n^3/3 MACs) instead of the two square ones of
    E = M K M^T; the residual's f64 signal survives the f32 cast
    because H's consumers only need eps32 RELATIVE accuracy (the same
    rebalancing the sharded engine in parallel/mixed.py uses).  The
    logdet is 2 sum log diag L + log det(I + H): a quartic trace series
    in H when |H|_F^2 < tau, else the two-level scheme (second f32
    factorization of I + H) for ill-conditioned K, via a real lax.cond
    so the fast path never pays for the fallback.
    """
    X, precond = refined_cholesky_solve(K, B, n_refine=n_refine,
                                        early_exit=True)
    L, M = precond
    n = K.shape[0]
    R32 = _factorization_residual_f32(K, L, _residual_block(n))
    M32 = M.astype(jnp.float32)
    H = jnp.dot(M32, jnp.dot(R32, M32.T,
                             precision=jax.lax.Precision.HIGHEST),
                precision=jax.lax.Precision.HIGHEST)
    trH2 = jnp.sum(H.astype(K.dtype) * H.astype(K.dtype))

    def _series(operands):
        # tr H in f64 from the diagonal; the higher traces are O(|H|^2)
        # corrections, so the one matmul they need (H^2) runs in f32
        L_, H_ = operands
        H2 = (H_ @ H_).astype(K.dtype)
        H64 = H_.astype(K.dtype)
        return (
            2.0 * jnp.sum(jnp.log(jnp.diag(L_)))
            + jnp.trace(H64)
            - jnp.sum(H64 * H64) / 2.0
            + jnp.sum(H2 * H64) / 3.0
            - jnp.sum(H2 * H2) / 4.0
        )

    def _robust(operands):
        # log det K = 2 sum log diag L + log det(I + H); factor I + H
        # at a second level exactly as _level2_logdet does for E
        L_, H_ = operands
        E_ = jnp.eye(n, dtype=K.dtype) + H_.astype(K.dtype)
        _L_E, M_E = _f32_preconditioner(E_)
        E2 = M_E @ E_ @ M_E.T
        D2 = E2 - jnp.eye(n, dtype=K.dtype)
        d2norm2 = jnp.sum(D2 * D2)
        corr2 = jnp.trace(D2) - 0.5 * d2norm2
        ld = (
            2.0 * jnp.sum(jnp.log(jnp.diag(L_)))
            - 2.0 * jnp.sum(jnp.log(jnp.diag(M_E)))
            + corr2
        )
        return jnp.where(d2norm2 < _LOGDET_FTOL2, ld, jnp.nan)

    # NaN trH2 (non-PD K) compares False -> robust branch -> NaN ld
    ld = jax.lax.cond(trH2 < _SERIES_TAU, _series, _robust, (L, H))
    return X, ld, (K, M, H, X)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mp_solve_and_logdet(n_refine, K, B):
    X, ld, _res = _mp_solve_and_logdet_core(n_refine, K, B)
    return X, ld


def _mp_sal_fwd(n_refine, K, B):
    X, ld, res = _mp_solve_and_logdet_core(n_refine, K, B)
    return (X, ld), res


def _mp_kinv(M, H):
    """K^{-1} from the saved preconditioner M and defect H, via the same
    series/robust lax.cond the logdet uses (shared by the backward rule
    and the forward-mode JVP twin)."""
    dtype = M.dtype
    n = M.shape[0]
    eye = jnp.eye(n, dtype=dtype)
    trH2 = jnp.sum(H.astype(dtype) * H.astype(dtype))

    def _series_inv(operands):
        # Kinv ~= M^T (I - H + H^2) M = M^T M - M^T (H - H^2) M.  The
        # identity part needs one f64 matmul; the correction is O(|H|)
        # relative to it, so its two matmuls run in f32 (error
        # O(1e-7 |H|) <= 1e-9 relative on Kinv).
        M_, H_ = operands
        Y = M_.T @ M_
        M32 = M_.astype(jnp.float32)
        HmH2 = H_ - H_ @ H_
        C = (M32.T @ (HmH2 @ M32)).astype(dtype)
        return Y - C

    def _robust_inv(operands):
        M_, H_ = operands
        E_ = eye + H_.astype(dtype)
        _L_E, M_E = _f32_preconditioner(E_)
        E2 = M_E @ E_ @ M_E.T
        DL = E2 - eye
        G = M_E @ M_
        W = (eye - DL + DL @ DL) @ G
        return G.T @ W

    return jax.lax.cond(trH2 < _SERIES_TAU, _series_inv, _robust_inv, (M, H))


def _mp_sal_bwd(n_refine, res, cot):
    """Analytic backward: all f64 work is matmuls.

    d(K^{-1}B) -> Kbar -= S X^T, Bbar = S with S = K^{-1} Xbar (one
    refined solve reusing the saved preconditioner); d(logdet K) ->
    Kbar += ldbar K^{-1}, with K^{-1} ~= M^T (I - H + H^2) M on the
    series branch (relative error O(|H|^3) <= 1e-6 at the guard) and
    the two-level analogue on the robust branch.
    """
    Xbar, ldbar = cot
    K, M, H, X = res

    squeeze = Xbar.ndim == 1
    Xb = Xbar.reshape(-1, 1) if squeeze else Xbar
    Xm = X.reshape(-1, 1) if squeeze else X
    S, _ = refined_cholesky_solve(K, Xb, precond=(M, M), n_refine=n_refine,
                                  early_exit=True)

    Kinv = _mp_kinv(M, H)
    Kbar = ldbar * Kinv - S @ Xm.T
    Bbar = S.reshape(Xbar.shape)
    return Kbar, Bbar


_mp_solve_and_logdet.defvjp(_mp_sal_fwd, _mp_sal_bwd)


def _refined_apply(K, M, B, iters):
    """Unrolled, guard-free refinement x -> ~K^{-1} B with a FIXED
    preconditioner: linear in B and built purely from transposable ops
    (matmuls, multiply+reduce), so it can serve as the tangent solve of
    the custom_jvp twins below -- reverse mode through those twins
    transposes exactly this computation.  (refined_cholesky_solve's
    convergence guard is a data-dependent jnp.where on the residual,
    which is nonlinear in B and must not appear on a tangent path.)"""
    squeeze = B.ndim == 1
    Bm = B.reshape(-1, 1) if squeeze else B
    X = _apply(M, Bm)
    for _ in range(iters):
        X = X + _apply(M, Bm - _f64_matvec(K, X))
    return X.reshape(-1) if squeeze else X


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _mp_sal_fwdmode(n_refine, K, B):
    X, ld, _res = _mp_solve_and_logdet_core(n_refine, K, B)
    return X, ld


@_mp_sal_fwdmode.defjvp
def _mp_sal_fwdmode_jvp(n_refine, primals, tangents):
    """Forward-mode rule: given the saved preconditioner, the tangents
    are one extra refined solve and a trace --
      dX  = K^{-1} (dB - dK X),
      dld = <K^{-1}, dK>  (K^{-1} from the same series as the VJP).
    Linear and transposable in (dK, dB), so jax also derives reverse
    mode from this rule (jacfwd-of-jacrev Hessians stay on the mixed
    engine end to end)."""
    K, B = primals
    dK, dB = tangents
    X, ld, (K_, M, H, _X) = _mp_solve_and_logdet_core(n_refine, K, B)
    squeeze = B.ndim == 1
    Xm = X.reshape(-1, 1) if squeeze else X
    dBm = dB.reshape(-1, 1) if squeeze else dB
    dRhs = dBm - _f64_matvec(dK, Xm)
    dX = _refined_apply(K, M, dRhs, n_refine)
    dX = dX.reshape(B.shape)
    dld = jnp.sum(_mp_kinv(M, H) * dK)
    return (X, ld), (dX, dld)


def mp_solve_and_logdet_fwdmode(K, B, n_refine=DEFAULT_REFINE_ITERS):
    """Forward-mode-capable twin of mp_solve_and_logdet (custom_jvp
    instead of custom_vjp).  Same primal; tangent rule above.  The
    dispatchers use it when the custom_vjp entry point rejects a JVP
    trace (is_fwd_mode_error), so jax.jacfwd / jax.hessian run on the
    mixed engine instead of falling back to f64.  Reverse-mode callers
    keep mp_solve_and_logdet: its analytic VJP computes K^{-1} in the
    backward pass, whereas reverse-through-this-twin would hold K^{-1}
    as a linearization residual (one extra n^2 f64 buffer)."""
    return _mp_sal_fwdmode(n_refine, K, B)


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _refined_solve_fwdmode(n_refine, K, B):
    X, _ = refined_cholesky_solve(K, B, n_refine=n_refine, early_exit=True)
    return X


@_refined_solve_fwdmode.defjvp
def _refined_solve_fwdmode_jvp(n_refine, primals, tangents):
    K, B = primals
    dK, dB = tangents
    X, (L, M) = refined_cholesky_solve(K, B, n_refine=n_refine,
                                       early_exit=True)
    squeeze = B.ndim == 1
    Xm = X.reshape(-1, 1) if squeeze else X
    dBm = dB.reshape(-1, 1) if squeeze else dB
    dX = _refined_apply(K, M, dBm - _f64_matvec(dK, Xm), n_refine)
    return X, dX.reshape(B.shape)


def refined_solve_fwdmode(K, B, n_refine=DEFAULT_REFINE_ITERS):
    """Forward-mode-capable twin of refined_solve (see
    mp_solve_and_logdet_fwdmode)."""
    return _refined_solve_fwdmode(n_refine, K, B)


def mp_solve_and_logdet(K, B, n_refine=DEFAULT_REFINE_ITERS):
    """(K^{-1} B, log det K) sharing one f32 preconditioner.

    Differentiable via an analytic custom VJP (see _mp_sal_bwd); the
    VJP residuals hold four n x n f64 buffers, so for n beyond ~10k
    use the sharded criterion in gpmp_tpu.parallel instead.  Reverse
    mode only: jax.jacfwd / jax.hessian through this function raises
    (custom_vjp); the core.linalg dispatchers catch that trace-time
    error (is_fwd_mode_error) and retry on the custom_jvp twin
    mp_solve_and_logdet_fwdmode, so library surfaces (NLL, LOO,
    Fisher) support second-order autodiff on the mixed engine.
    """
    return _mp_solve_and_logdet(n_refine, K, B)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _refined_solve_grad(n_refine, K, B):
    X, _ = refined_cholesky_solve(K, B, n_refine=n_refine,
                                  early_exit=True)
    return X

def _rs_fwd(n_refine, K, B):
    X, precond = refined_cholesky_solve(K, B, n_refine=n_refine,
                                        early_exit=True)
    return X, (K, precond[1], X)

def _rs_bwd(n_refine, res, Xbar):
    K, M, X = res
    squeeze = Xbar.ndim == 1
    Xb = Xbar.reshape(-1, 1) if squeeze else Xbar
    Xm = X.reshape(-1, 1) if squeeze else X
    S, _ = refined_cholesky_solve(K, Xb, precond=(M, M), n_refine=n_refine,
                                  early_exit=True)
    return -S @ Xm.T, S.reshape(Xbar.shape)

_refined_solve_grad.defvjp(_rs_fwd, _rs_bwd)


def refined_solve(K, B, n_refine=DEFAULT_REFINE_ITERS):
    """K^{-1} B via the f32-preconditioned refined solve, with an
    analytic custom VJP (Kbar = -S X^T, Bbar = S = K^{-1} Xbar) so
    reverse-mode never differentiates the preconditioner construction."""
    return _refined_solve_grad(n_refine, K, B)


def mp_solve_and_inv_diag(K, B, n_refine=DEFAULT_REFINE_ITERS):
    """(K^{-1} B to ~f64, diag(K^{-1}) to ~1e-7 relative).

    The LOO building block (reference loo.py:65-83 needs exactly
    (K^{-1} z)_i and (K^{-1})_ii).  diag(K^{-1}) comes from the same
    series the logdet uses: K^{-1} ~= M^T (I - D + D^2) M with
    D = M K M^T - I, so diag = colsumsq(M) - diag(M^T (D - D^2) M),
    the correction evaluated in f32 (it is O(|D|) relative to the
    identity part).  D keeps the two f64 matmuls of the E-form HERE
    even though the logdet path switched to the one-matmul
    factorization-residual H: diag entries are consumed individually
    (the LOO parity bar is 1e-8 in max norm), so the eps32-relative
    noise of an f32 H -- which averages out inside the logdet traces --
    would land directly on each diagonal entry (measured 1.1e-7).
    Falls back to the two-level expansion through the same lax.cond
    guard as the logdet; non-PD K yields NaNs.  Plain
    reverse-differentiable (no while_loop).
    """
    X, precond = refined_cholesky_solve(K, B, n_refine=n_refine)
    _L, M = precond
    n = K.shape[0]
    E = M @ (K @ M.T)
    D = E - jnp.eye(n, dtype=K.dtype)
    trD2 = jnp.sum(D * D)

    def _series(operands):
        M_, D_ = operands
        M32 = M_.astype(jnp.float32)
        D32 = D_.astype(jnp.float32)
        DmD2 = D32 - D32 @ D32
        corr = jnp.sum(M32 * (DmD2 @ M32), axis=0).astype(K.dtype)
        return jnp.sum(M_ * M_, axis=0) - corr

    def _robust(operands):
        M_, D_ = operands
        E_ = D_ + jnp.eye(n, dtype=K.dtype)
        _L_E, M_E = _f32_preconditioner(E_)
        E2 = M_E @ E_ @ M_E.T
        DL = E2 - jnp.eye(n, dtype=K.dtype)
        G = M_E @ M_
        W = (jnp.eye(n, dtype=K.dtype) - DL + DL @ DL) @ G
        d = jnp.sum(G * W, axis=0)
        # inherit the two-level convergence guard semantics
        return jnp.where(jnp.sum(DL * DL) < _LOGDET_FTOL2, d, jnp.nan)

    diag_inv = jax.lax.cond(trD2 < _SERIES_TAU, _series, _robust, (M, D))
    return X, diag_inv


# backward-compatible helper (factor only)
def mp_cholesky(K):
    """Approximate (jittered) lower Cholesky factor from f32."""
    L, _ = _f32_preconditioner(K)
    return L
