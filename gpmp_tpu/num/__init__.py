# gpmp_tpu/num/__init__.py
"""JAX numerical namespace (`gnp`) for gpmp_tpu.

TPU-native replacement for the reference's dual numpy/torch backend layer
(/root/reference/gpmp/num/numpy_backend.py, torch_backend.py).  There is a
single backend (JAX); everything here is either a thin re-export of
``jax.numpy`` or a GP-specific helper implemented the JAX way:

- autodiff is ``jax.grad`` / ``jax.value_and_grad`` (the reference's
  finite differences on numpy and torch autograd collapse into this);
- the criterion-wrapper protocol (`evaluate`, `evaluate_pre_grad`,
  `gradient`, `evaluate_no_grad`) is kept as the optimizer boundary
  (numpy_backend.py:329-428 semantics) but implemented with one jitted
  ``value_and_grad``;
- linalg failures do not raise inside jit: a failed Cholesky yields NaNs,
  which the wrappers map to +inf criterion values (the JAX analogue of the
  reference's exception-to-inf machinery, numpy_backend.py:30-46, 344-350);
- RNG: JAX PRNG keys.  A module-level key + ``set_seed`` shim preserves the
  reference's global-generator UX (numpy_backend.py:474-499); performance
  paths should pass keys explicitly.

Everything is float64 by default (``jax_enable_x64``) for numerical parity
with the reference; float32 fast mode via ``GPMP_DTYPE=float32``.
"""

from __future__ import annotations

import builtins
import functools
import os
from typing import Any, Callable, Iterable, Optional, Tuple, Union

builtins_max = builtins.max

from gpmp_tpu.config import get_config, get_logger, init_backend

_config = get_config()
_gpmp_backend_: str = init_backend()

import jax

if _config.dtype == "float64":
    jax.config.update("jax_enable_x64", True)

# XLA:TPU lowers f32 matmuls to single-pass bf16 by DEFAULT (~3e-3 rel
# err) -- enough to drift blocked factorizations non-PD and corrupt f32
# gram/quadratic forms.  Force true-f32 matmuls; f64 is unaffected, and
# users who want raw bf16 speed can reset this after import.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache.  Every parameter-selection call
# builds fresh criterion closures, so jax's in-memory jit cache (keyed
# on function identity) misses across fits; the persistent cache is
# keyed on the HLO itself and cuts repeat-fit / repeat-process compile
# time by ~3x on TPU.  GPMP_COMPILE_CACHE=0 disables; any other value
# overrides the cache directory.
_cache_spec = os.environ.get("GPMP_COMPILE_CACHE", "")
_user_cache = getattr(jax.config, "jax_compilation_cache_dir", None)


def _machine_fingerprint():
    """Short id of this host's CPU microarchitecture.

    Cache entries can embed XLA:CPU AOT executables specialized to the
    compile host's ISA features; loading them on a host with different
    features risks SIGILL (cpu_aot_loader warns loudly).  Keying the
    cache directory on (arch, cpu-flags) keeps each machine's entries
    separate, so entries never cross hosts.
    """
    import hashlib
    import platform as _platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    raw = (_platform.machine() + "|" + flags).encode()
    return hashlib.sha256(raw).hexdigest()[:10]


# The persistent cache is ON by default only when a non-CPU backend is
# named in jax_platforms (tpu, axon tunnel, ...): that's where it pays
# (server-side compiles).  Plain CPU processes -- tests, the multichip
# dryrun, and CPU-only hosts with jax_platforms unset -- skip it:
# serialized XLA:CPU executables are AOT artifacts whose embedded tuning
# pseudo-features (+prefer-no-scatter, ...) fail the loader's
# host-feature check even on the SAME machine -- including same-run
# reloads of same-session entries (fresh criterion closures miss the
# in-memory jit cache and re-load from disk), which has been observed
# to desynchronize cross-module collectives and SIGABRT the process
# (round-3 postmortem, reproduced round 4 with a fresh per-run dir).
# GPMP_COMPILE_CACHE=<dir> still opts in explicitly anywhere, but on
# CPU hosts prefer leaving it off.
_platforms = str(getattr(jax.config, "jax_platforms", "") or "")
if _platforms:
    _noncpu_backend = any(
        p.strip() and p.strip().lower() != "cpu" for p in _platforms.split(",")
    )
else:
    # Backend auto-detection (jax_platforms unset): a real TPU host must
    # not silently lose the cache (ADVICE r4).  A full device query here
    # would initialize the backend at import, so use the presence of a
    # TPU runtime (libtpu) as the signal instead; CPU-only hosts have no
    # libtpu and stay off.
    import importlib.util as _ilu

    _noncpu_backend = _ilu.find_spec("libtpu") is not None

# Bump when the cache install policy changes in a way that can
# invalidate old entries (e.g. enabling/disabling the XLA-internal AOT
# sub-caches below).  Old directories are simply abandoned: a cache
# must degrade to recompiling, never to loading an incompatible entry.
_CACHE_FORMAT_VERSION = 2

if _cache_spec != "0" and not _user_cache and (_noncpu_backend or _cache_spec):
    # honor a cache dir the host application configured before import;
    # only install ours when none is set (see README "side effects").
    # Every directory -- including an explicit GPMP_COMPILE_CACHE=<dir>
    # -- gets a machine-fingerprint + format-version leaf so entries
    # can never cross hosts (shared NFS homes) or policy generations.
    _cache_dir = os.path.join(
        _cache_spec or os.path.join(
            os.path.expanduser("~"), ".cache", "gpmp_tpu", "xla"
        ),
        "%s-v%d" % (_machine_fingerprint(), _CACHE_FORMAT_VERSION),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache EVERYTHING, including sub-second op-by-op dispatch
        # programs: on remote/tunneled backends each tiny eager op costs
        # a ~0.4 s server compile round-trip, and a first fit dispatches
        # ~40 of them -- cached they re-load in ~40 ms (measured; this
        # alone is ~18 s of first-fit wall-clock on the TPU tunnel)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # the XLA-internal AOT sub-caches mis-detect host features when
        # entries cross processes with different platform lists and
        # warn loudly; the jax-level executable cache is the win here
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # unwritable cache dir: stay with in-memory jit
        pass

import numpy as _onp
import jax.numpy as jnp
from jax import lax

Scalar = Union[int, float]
ArrayLike = Any
CriterionCallable = Callable[[ArrayLike, ArrayLike, ArrayLike], ArrayLike]
LoaderLike = Iterable[Tuple[ArrayLike, ArrayLike]]

_dtype = jnp.float64 if _config.dtype == "float64" else jnp.float32
_config.dtype_resolved = _dtype
get_logger().info("Using backend: jax (dtype=%s)", _dtype.__name__)

ndarray = jax.Array

# ----------------------------------------------------------------------------
# Re-exports (pure jnp)
# ----------------------------------------------------------------------------
from jax.numpy import (  # noqa: F401
    array_equal,
    reshape,
    where,
    isscalar,
    isnan,
    isinf,
    isfinite,
    isclose,
    allclose,
    unique,
    nan_to_num,
    hstack,
    vstack,
    stack,
    tile,
    concatenate,
    split,
    expand_dims,
    empty_like,
    zeros_like,
    ones_like,
    full_like,
    diag,
    arange,
    meshgrid,
    floor,
    ceil,
    abs,
    sqrt,
    exp,
    log,
    log10,
    log1p,
    sin,
    cos,
    tan,
    tanh,
    diff,
    sum,
    cumsum,
    prod,
    mean,
    std,
    var,
    cov,
    percentile,
    quantile,
    sort,
    argsort,
    min,
    max,
    argmin,
    argmax,
    minimum,
    maximum,
    clip,
    einsum,
    matmul,
    trace,
    inner,
    outer,
    all,
    any,
    logical_not,
    logical_and,
    logical_or,
    convolve,
    take,
    squeeze,
    atleast_2d,
)
from jax.numpy import pi, inf, nan, finfo, float64, float32, int32, int64  # noqa: F401
from jax.numpy.linalg import norm, cond, cholesky, svd, eigh  # noqa: F401
from jax.scipy.special import gammaln  # noqa: F401

eps = float(jnp.finfo(_dtype).eps)
fmax = float(jnp.finfo(_dtype).max)


def safe_inf():
    """+inf with the working dtype (criterion value on linalg failure)."""
    return jnp.asarray(jnp.inf, dtype=_dtype)


def safe_neginf():
    return jnp.asarray(-jnp.inf, dtype=_dtype)


# ----------------------------------------------------------------------------
# dtype-coercing constructors (reference semantics: floats -> working dtype,
# ints preserved; numpy_backend.py:166-231)
# ----------------------------------------------------------------------------
def array(x, dtype=None):
    if dtype is not None:
        return jnp.array(x, dtype=dtype)
    out = jnp.array(x)
    if jnp.issubdtype(out.dtype, jnp.floating):
        return out.astype(_dtype)
    return out


def asarray(x, dtype=None):
    if dtype is not None:
        return jnp.asarray(x, dtype=dtype)
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != _dtype:
            return x.astype(_dtype)
        return x
    if isinstance(x, jax.core.Tracer):
        return x
    if isinstance(x, (int, float)) and not isinstance(x, bool):
        dt = _dtype if isinstance(x, float) else None
        return jnp.array([x], dtype=dt)
    out = jnp.asarray(x)
    if jnp.issubdtype(out.dtype, jnp.floating):
        return out.astype(_dtype)
    return out


def empty(shape, dtype=None):
    # JAX has no uninitialized memory; zeros is the functional equivalent.
    return jnp.zeros(shape, dtype=_dtype if dtype is None else dtype)


def zeros(shape, dtype=None):
    return jnp.zeros(shape, dtype=_dtype if dtype is None else dtype)


def ones(shape, dtype=None):
    return jnp.ones(shape, dtype=_dtype if dtype is None else dtype)


def full(shape, fill_value, dtype=None):
    return jnp.full(shape, fill_value, dtype=_dtype if dtype is None else dtype)


def eye(n, m=None, k=0, dtype=None):
    return jnp.eye(n, M=m, k=k, dtype=_dtype if dtype is None else dtype)


def linspace(start, stop, num=50, endpoint=True, retstep=False, dtype=None, axis=0):
    return jnp.linspace(
        start, stop, num=num, endpoint=endpoint, retstep=retstep,
        dtype=_dtype if dtype is None else dtype, axis=axis,
    )


def logspace(start, stop, num=50, endpoint=True, base=10.0, dtype=None, axis=0):
    return jnp.logspace(
        start, stop, num=num, endpoint=endpoint, base=base,
        dtype=_dtype if dtype is None else dtype, axis=axis,
    )


def copy(x):
    return jnp.array(x, copy=True)


def transpose(x, dim0, dim1):
    """Torch-style transpose: swap two dimensions."""
    return jnp.swapaxes(x, dim0, dim1)


def asdouble(x):
    return jnp.asarray(x).astype(jnp.float64 if _dtype == jnp.float64 else _dtype)


def asint(x):
    return jnp.asarray(x).astype(jnp.int64)


def to_np(x):
    """Device array -> host numpy array (identity for non-arrays)."""
    if isinstance(x, jax.Array):
        return _onp.asarray(x)
    return x


def to_numpy(x):
    """Alias of to_np (reference: gpmp calls gnp.to_numpy, e.g. nuts.py:1163)."""
    return to_np(x)


def to_scalar(x):
    if isinstance(x, (int, float, bool)):
        return x
    return x.item()


def isarray(x):
    return isinstance(x, (jax.Array, _onp.ndarray))


def inftobigf(a, bigf=fmax / 1000.0):
    """Replace +-inf by a big finite value (keeps Matern polynomial finite)."""
    return jnp.where(jnp.isinf(a), jnp.full_like(a, bigf), a)


def get_dtype():
    return _dtype


# ----------------------------------------------------------------------------
# Distances
# ----------------------------------------------------------------------------
_CDIST_BLOCK_BUDGET = 2**27  # max elements of the (b, m, d) difference tensor


@jax.custom_jvp
def _safe_sqrt(d2):
    """sqrt with a zero-masked derivative: d/dx sqrt(x) at x=0 is +inf,
    which poisons autodiff through the gram diagonal (coincident points).
    The subgradient 0 is the correct choice there (cf. the reference torch
    backend's custom_sqrt, torch_backend.py:783-807).

    Implemented as a custom_jvp (plain sqrt forward, masked tangent) rather
    than a where/where sandwich: the masking then only exists in the
    backward graph, keeping the forward primal a single fusable sqrt.
    """
    return jnp.sqrt(d2)


@_safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (d2,), (t,) = primals, tangents
    pos = d2 > 0.0
    # recursive call keeps the rule itself higher-order differentiable
    y = _safe_sqrt(d2)
    grad = jnp.where(pos, 0.5 / jnp.where(pos, y, 1.0), 0.0)
    return y, grad * t


def _cdist_diff(x, y):
    """Accurate pairwise Euclidean distances via explicit differences."""
    d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return _safe_sqrt(d2)


def cdist(x, y):
    """Pairwise Euclidean distance matrix, blocked for large inputs.

    Uses the difference formulation (accurate, like scipy's cdist) rather
    than the Gram-matrix trick (which loses ~sqrt(eps) relative accuracy for
    nearby points).  For large problems, rows are processed in blocks via
    lax.map so the (n, m, d) intermediate never materializes.
    """
    x = jnp.atleast_2d(x)
    y = jnp.atleast_2d(y)
    n, d = x.shape
    m = y.shape[0]
    if n * m * builtins_max(d, 1) <= _CDIST_BLOCK_BUDGET:
        return _cdist_diff(x, y)
    block = builtins_max(1, _CDIST_BLOCK_BUDGET // (m * builtins_max(d, 1)))
    nblocks = -(-n // block)
    npad = nblocks * block - n
    xpad = jnp.pad(x, ((0, npad), (0, 0)))
    xb = xpad.reshape(nblocks, block, d)
    out = lax.map(lambda xi: _cdist_diff(xi, y), xb)
    return out.reshape(nblocks * block, m)[:n]


def scaled_distance(loginvrho, x, y):
    """Anisotropic scaled distance: cdist(exp(loginvrho)*x, exp(loginvrho)*y)."""
    invrho = jnp.exp(loginvrho)
    return cdist(invrho * x, invrho * y)


def scaled_distance_elementwise(loginvrho, x, y):
    if x is y or y is None:
        return jnp.zeros((x.shape[0],), dtype=_dtype)
    invrho = jnp.exp(loginvrho)
    return _safe_sqrt(jnp.sum((invrho * (x - y)) ** 2, axis=1))


# ----------------------------------------------------------------------------
# Linear algebra
# ----------------------------------------------------------------------------
from jax.scipy.linalg import solve_triangular as _solve_triangular
from jax.scipy.linalg import cho_factor, cho_solve  # noqa: F401


def solve_triangular(A, b, lower=False, trans=0):
    return _solve_triangular(A, b, lower=lower, trans=trans)


def solve(A, b, **kwargs):
    """Dense solve via Householder QR (LU is avoided by design: on the TPU
    compile path only Cholesky/QR/SVD-family factorizations are supported,
    and QR is backward-stable without pivoting heuristics).

    scipy-style kwargs (overwrite_a, assume_a) are accepted and ignored --
    XLA owns the memory and chooses the schedule.
    """
    kwargs.pop("overwrite_a", None)
    kwargs.pop("overwrite_b", None)
    kwargs.pop("assume_a", None)
    Q, R = jnp.linalg.qr(A)
    return _solve_triangular(R, Q.T @ b, lower=False)


def inv(A):
    """Matrix inverse via QR (LU-free; see solve)."""
    Q, R = jnp.linalg.qr(A)
    return _solve_triangular(R, Q.T, lower=False)


def qr(a, mode="reduced"):
    return jnp.linalg.qr(a, mode=mode)


def slogdet(A):
    """(sign, log|det A|) for a general square matrix.

    Uses jnp.linalg.slogdet(method='qr'): Householder QR with the
    reflector count tracked, so the SIGN is exact for any invertible A
    (the naive prod(sign(diag R)) misses det(Q) = +-1).  LU-free by
    design (TPU compile path; reference numpy_backend.py slogdet)."""
    return jnp.linalg.slogdet(A, method="qr")


def logdet(A):
    """log|A| for symmetric positive-definite A via Cholesky.

    NaN when A is not PD (inside jit we cannot raise like the reference
    numpy_backend.py:450-456; the NaN is mapped to +inf at the criterion
    boundary).  LU-free by design.
    """
    L = jnp.linalg.cholesky(A)
    return 2.0 * jnp.sum(jnp.log(jnp.diag(L)))


def cholesky_inv(A):
    n = A.shape[-1]
    L = jnp.linalg.cholesky(A)
    T = _solve_triangular(L, jnp.eye(n, dtype=A.dtype), lower=True)
    return T.T @ T


def cholesky_solve(A, b):
    """Solve A x = b for SPD A via Cholesky.  Returns (x, L).

    On a non-PD matrix the factor contains NaNs (TPU/XLA convention) rather
    than raising; callers detect non-finite results (cf. reference
    numpy_backend.py:465-469 which raises through LAPACK).
    """
    L = jnp.linalg.cholesky(A)
    y = _solve_triangular(L, b, lower=True)
    x = _solve_triangular(L.T, y, lower=False)
    return x, L


# ----------------------------------------------------------------------------
# RNG: PRNG-key shim with global-seed UX
# ----------------------------------------------------------------------------
_rng_key = jax.random.PRNGKey(_config.seed)


def set_seed(seed: int) -> None:
    """Reset the global PRNG key (UX parity with reference set_seed)."""
    global _rng_key
    _rng_key = jax.random.PRNGKey(seed)


def next_key():
    """Split and return a fresh subkey from the global key."""
    global _rng_key
    _rng_key, sub = jax.random.split(_rng_key)
    return sub


def rand(*shape: int):
    return jax.random.uniform(next_key(), shape, dtype=_dtype)


def randn(*shape: int):
    return jax.random.normal(next_key(), shape, dtype=_dtype)


def choice(a, size=None, replace=True, p=None):
    a = jnp.asarray(a) if not jnp.isscalar(a) else a
    shape = () if size is None else (size if isinstance(size, tuple) else (size,))
    return jax.random.choice(next_key(), a, shape=shape, replace=replace, p=p)


def permutation(x):
    if isinstance(x, int):
        return jax.random.permutation(next_key(), x)
    return jax.random.permutation(next_key(), jnp.asarray(x))


class normal:
    """scipy.stats.norm-like interface on JAX."""

    @staticmethod
    def pdf(x, loc=0.0, scale=1.0):
        return jax.scipy.stats.norm.pdf(x, loc=loc, scale=scale)

    @staticmethod
    def logpdf(x, loc=0.0, scale=1.0):
        return jax.scipy.stats.norm.logpdf(x, loc=loc, scale=scale)

    @staticmethod
    def cdf(x, loc=0.0, scale=1.0):
        return jax.scipy.stats.norm.cdf(x, loc=loc, scale=scale)

    @staticmethod
    def logcdf(x, loc=0.0, scale=1.0):
        """Log normal CDF (reference: torch_backend.py:966)."""
        return jax.scipy.stats.norm.logcdf(x, loc=loc, scale=scale)

    @staticmethod
    def ppf(q, loc=0.0, scale=1.0):
        return jax.scipy.stats.norm.ppf(q, loc=loc, scale=scale)

    @staticmethod
    def rvs(loc=0.0, scale=1.0, size=None):
        shape = () if size is None else (size if isinstance(size, tuple) else (size,))
        return loc + scale * jax.random.normal(next_key(), shape, dtype=_dtype)

    # reference sometimes calls positionally as normal.rvs(mean, std, size=n)
    def __class_getitem__(cls, item):  # pragma: no cover
        raise TypeError


class multivariate_normal:
    """scipy.stats.multivariate_normal-like interface.

    rvs/logpdf run on device; cdf falls back to SciPy on host (no closed-form
    mvn cdf in XLA) -- matches reference behavior which also used SciPy
    (numpy_backend.py:553-572).
    """

    @staticmethod
    def _mean_array(mean, d):
        m = jnp.asarray(mean, dtype=_dtype)
        if m.ndim == 0:
            return jnp.full((d,), m, dtype=_dtype)
        m = m.reshape(-1)
        if m.size != d:
            raise ValueError("mean has incompatible length.")
        return m

    @staticmethod
    def rvs(mean=0.0, cov=1.0, n=1, key=None):
        if key is None:
            key = next_key()
        if jnp.isscalar(cov) or (isarray(cov) and jnp.asarray(cov).size == 1):
            c = jnp.sqrt(jnp.asarray(cov, dtype=_dtype)).reshape(())
            m = jnp.asarray(mean, dtype=_dtype)
            out = m + c * jax.random.normal(key, (n,), dtype=_dtype)
            return out
        covm = jnp.asarray(cov, dtype=_dtype)
        if covm.ndim != 2 or covm.shape[0] != covm.shape[1]:
            raise ValueError("cov must be a scalar or a square 2D matrix.")
        d = covm.shape[0]
        m = multivariate_normal._mean_array(mean, d)
        out = jax.random.multivariate_normal(
            key, m, covm, shape=(n,), dtype=_dtype, method="svd"
        )
        if n == 1:
            return out[0]
        return out

    @staticmethod
    def logpdf(x, mean=0.0, cov=1.0):
        if jnp.isscalar(cov) or (isarray(cov) and jnp.asarray(cov).size == 1):
            scale = jnp.sqrt(jnp.asarray(cov, dtype=_dtype)).reshape(())
            return jax.scipy.stats.norm.logpdf(jnp.asarray(x), loc=mean, scale=scale)
        covm = jnp.asarray(cov, dtype=_dtype)
        d = covm.shape[0]
        m = multivariate_normal._mean_array(mean, d)
        return jax.scipy.stats.multivariate_normal.logpdf(jnp.asarray(x), m, covm)

    @staticmethod
    def cdf(x, mean=0.0, cov=1.0):
        import numpy as np
        import scipy.stats as _sps

        if jnp.isscalar(cov) or (isarray(cov) and jnp.asarray(cov).size == 1):
            return jax.scipy.stats.norm.cdf(
                jnp.asarray(x), loc=mean, scale=jnp.sqrt(jnp.asarray(cov)).reshape(())
            )
        xm = np.asarray(x)
        covm = np.asarray(cov)
        d = covm.shape[0]
        m = np.asarray(multivariate_normal._mean_array(mean, d))
        return jnp.asarray(_sps.multivariate_normal.cdf(xm, mean=m, cov=covm))


# ----------------------------------------------------------------------------
# Shared helpers (reference num/shared.py semantics)
# ----------------------------------------------------------------------------
def compute_gammaln(up_to_p: int):
    """gammaln(k) for k = 0..2p+1, cached in config.caches['gammaln']."""
    n = 2 * up_to_p + 2
    cache = _config.caches.setdefault("gammaln", {})
    table = cache.get("table")
    if table is None or table.shape[0] < n:
        table = gammaln(jnp.arange(builtins_max(n, 64), dtype=_dtype))
        cache["table"] = table
    return table[:n]


def derivative_finite_diff(f, x, h):
    """5-point central difference derivative of f w.r.t. scalar x."""
    f_x_p2 = f(x + 2 * h)
    f_x_p1 = f(x + h)
    f_x_m1 = f(x - h)
    f_x_m2 = f(x - 2 * h)
    return (-f_x_p2 + 8 * f_x_p1 - 8 * f_x_m1 + f_x_m2) / (12.0 * h)


def try_with_postmortem(func, *args, **kwargs):
    try:
        return func(*args, **kwargs)
    except Exception:
        import pdb
        import sys
        import traceback

        traceback.print_exc()
        pdb.post_mortem(sys.exc_info()[2])


# ----------------------------------------------------------------------------
# Autodiff (jax.grad replaces both FD-numpy and torch autograd)
# ----------------------------------------------------------------------------
def grad(f):
    """Gradient function of scalar f (autodiff, not finite differences)."""
    g = jax.grad(f)

    def grad_f(x):
        return g(asarray(x))

    return grad_f


def value_and_grad(f, x, **unused):
    """(f(x), grad f(x)) -- reference signature value_and_grad(f, x)."""
    y, g = jax.value_and_grad(f)(asarray(x))
    return y, g


def _finite_or_inf(value):
    return jnp.where(jnp.isfinite(value), value, jnp.inf)


def _criterion_programs(crit, program_key):
    """(value_and_grad, value) jitted programs for a criterion closure.

    ``jax.jit``'s in-memory executable cache is keyed on function
    identity, and every parameter-selection call builds fresh closures,
    so repeat fits in one process normally retrace and re-hit the
    persistent compilation cache.  When ``program_key`` is not None the
    jit objects themselves are cached process-wide (config caches):
    a later fit whose criterion is semantically identical -- same
    underlying criterion function and bound hyperparameters, same model
    callables, same baked meanparam, same shapes/dtypes and Cholesky
    engine (see kernel/parameter_selection._criterion_program_key) --
    reuses the already-compiled executables with zero retrace.  The key
    tuple holds strong references to the keyed functions, so identity
    can never be recycled.  ``gpmp_tpu.config.clear_caches()`` empties
    the cache.
    """
    if program_key is not None:
        cache = _config.caches.setdefault("criterion_programs", {})
        entry = cache.get(program_key)
        if entry is not None:
            return entry
    entry = (
        jax.jit(jax.value_and_grad(lambda p, xx, zz: crit(p, xx, zz))),
        jax.jit(lambda p, xx, zz: crit(p, xx, zz)),
    )
    if program_key is not None:
        cache[program_key] = entry
        while len(cache) > 32:  # FIFO cap: executables + keyed fn refs
            cache.pop(next(iter(cache)))
    return entry


class DifferentiableSelectionCriterion:
    """Criterion wrapper exposing the 4-callable optimizer protocol.

    One jitted ``value_and_grad`` under the hood; ``evaluate_pre_grad``
    caches the gradient so the optimizer's subsequent ``gradient`` call at
    the same point is free (mirrors the torch backend's retained-graph
    pairing, torch_backend.py:547-604, without any mutable graph state).
    Non-finite values (failed Cholesky -> NaN) map to +inf with zero grad.
    """

    def __init__(self, crit: CriterionCallable, x, z, program_key=None):
        self.crit = crit
        self.x, self.z = asarray(x), asarray(z)
        self._vg, self._v = _criterion_programs(crit, program_key)
        self._cache_p = None
        self._cache_g = None

    def __call__(self, p):
        return self.evaluate(p)

    def _compute(self, p):
        p = asarray(p)
        value, g = self._vg(p, self.x, self.z)
        # one host transfer for (value, grad): separate float()/asarray
        # fetches pay a full round-trip each on remote/tunneled devices
        # (~30 ms apiece, which dominated small-n SLSQP fits)
        value, g = jax.device_get((value, g))
        value = float(value)
        if not _onp.isfinite(value):
            return _onp.inf, _onp.zeros_like(_onp.asarray(p))
        if not _onp.all(_onp.isfinite(g)):
            g = _onp.zeros_like(g)
        return value, g

    def evaluate(self, p):
        value, g = self._compute(p)
        self._cache_p, self._cache_g = _onp.asarray(p).copy(), g
        return value

    def evaluate_pre_grad(self, p):
        return self.evaluate(p)

    def evaluate_no_grad(self, p):
        value = float(self._v(asarray(p), self.x, self.z))
        return value if _onp.isfinite(value) else _onp.inf

    def gradient(self, p):
        pnp = _onp.asarray(p)
        if self._cache_p is not None and _onp.array_equal(pnp, self._cache_p):
            return self._cache_g
        _, g = self._compute(p)
        return g

    def evaluate_batch(self, P):
        """Vectorized evaluation over a (m, p) stack of parameter vectors:
        one jitted vmap call instead of m host round-trips (used by the
        diagnostics profilers)."""
        if not hasattr(self, "_vbatch"):
            self._vbatch = jax.jit(
                jax.vmap(lambda p, xx, zz: self.crit(p, xx, zz), in_axes=(0, None, None))
            )
        vals = self._vbatch(asarray(P), self.x, self.z)
        return _onp.asarray(vals)


class BatchDifferentiableSelectionCriterion:
    """Batched criterion over a DataLoader: jitted per-batch value_and_grad,
    host-side accumulation weighted by batch size (semantics of reference
    numpy_backend.py:353-428 / torch_backend.py:607-718)."""

    def __init__(self, crit, loader, reduction="mean", batches_per_eval=0):
        if reduction not in ("mean", "sum"):
            raise ValueError("reduction must be 'mean' or 'sum'")
        if batches_per_eval < 0:
            raise ValueError("batches_per_eval must be >= 0")
        self.crit = crit
        self.loader = loader
        self.reduction = reduction
        self.bpe = int(batches_per_eval)
        self._batch_iter = iter(loader) if self.bpe > 0 else None
        self._vg = jax.jit(jax.value_and_grad(lambda p, xb, zb: crit(p, xb, zb)))
        self._cache_p = None
        self._cache_g = None

    def __call__(self, p):
        return self.evaluate_no_grad(p)

    def _batches(self):
        if self.bpe == 0:
            yield from self.loader
        else:
            for _ in range(self.bpe):
                try:
                    yield next(self._batch_iter)
                except StopIteration:
                    self._batch_iter = iter(self.loader)
                    yield next(self._batch_iter)

    def _accumulate(self, p):
        p = asarray(p)
        total = 0.0
        gtotal = _onp.zeros(_onp.asarray(p).shape)
        n_samples = 0
        for xb, zb in self._batches():
            bs = xb.shape[0]
            v, g = self._vg(p, asarray(xb), asarray(zb))
            total += float(v) * bs
            gtotal += _onp.asarray(g) * bs
            n_samples += bs
        if n_samples == 0:
            raise ValueError("Loader is empty.")
        if self.reduction == "mean":
            total /= n_samples
            gtotal /= n_samples
        if not _onp.isfinite(total):
            return _onp.inf, _onp.zeros_like(gtotal)
        if not _onp.all(_onp.isfinite(gtotal)):
            gtotal = _onp.zeros_like(gtotal)
        return total, gtotal

    def evaluate(self, p):
        value, g = self._accumulate(p)
        self._cache_p, self._cache_g = _onp.asarray(p).copy(), g
        return value

    def evaluate_pre_grad(self, p):
        return self.evaluate(p)

    def evaluate_no_grad(self, p):
        value, _ = self._accumulate(p)
        return value

    def gradient(self, p):
        pnp = _onp.asarray(p)
        if self._cache_p is not None and _onp.array_equal(pnp, self._cache_p):
            return self._cache_g
        _, g = self._accumulate(p)
        return g


class SecondOrderDifferentiableFunction:
    """Value/gradient/Hessian of a scalar function (jax.hessian).

    jax.hessian is forward-over-reverse; library criteria routed
    through the mixed Cholesky engine support it natively (the engine
    dispatchers retry forward-mode traces on custom_jvp twins, see
    core/linalg.py).  The TypeError fallback below is a backstop for
    user functions that call the engine's custom-VJP entry points
    DIRECTLY (bypassing the dispatchers): such Hessians retrace once
    with the f64 engine pinned via config.set_chol_engine (engine
    dispatch is a trace-time config read), logged."""

    def __init__(self, f):
        self.f = f
        self._g = jax.jit(jax.grad(f))
        self._h = jax.jit(jax.hessian(f))
        self._h_fallback = None
        self._theta = None
        self._value = None

    def evaluate(self, theta):
        self._theta = asarray(theta)
        self._value = self.f(self._theta)
        return self._value

    def gradient(self):
        return self._g(self._theta)

    def hessian(self):
        if self._h_fallback is not None:
            return self._h_fallback(self._theta)
        try:
            return self._h(self._theta)
        except TypeError:
            from gpmp_tpu.config import get_logger

            get_logger().warning(
                "jax.hessian does not support the mixed Cholesky engine's "
                "reverse-only custom VJP; retracing this Hessian with the "
                "exact f64 engine."
            )
            from gpmp_tpu.config import get_chol_engine, set_chol_engine

            prev = get_chol_engine()
            set_chol_engine("f64")
            try:
                self._h_fallback = jax.jit(jax.hessian(self.f))
                return self._h_fallback(self._theta)
            finally:
                set_chol_engine(prev)


def _is_linalg_exception(exc: Exception) -> bool:
    """JAX surfaces linalg failure as NaNs, not exceptions; kept for the
    optimizer driver's defensive path (parameter_selection semantics)."""
    msg = str(exc).lower()
    keywords = ("singular", "cholesky", "not positive definite", "linalg", "lapack")
    return builtins.any(k in msg for k in keywords)


# ----------------------------------------------------------------------------
# torch-backend API-parity shims.  The gnp contract is the union of the
# reference's two backend namespaces (SURVEY 2.1); these are the
# torch-only symbols user code may touch (torch_backend.py:62-64,
# 115-116, 282-294, 375-383, 783-789).
# ----------------------------------------------------------------------------
TensorLike = Union[jax.Array, float, int]

# numpy_backend.py exports numpy.typing.NDArray for annotations; here the
# array type is jax.Array.
NDArray = jax.Array

tensor = asarray


def is_tensor(x) -> bool:
    """True for device arrays (torch.is_tensor parity)."""
    return isinstance(x, jax.Array)


def det(A):
    """Determinant via the sign-tracking QR slogdet (LU-free)."""
    sign, logabs = slogdet(A)
    return sign * jnp.exp(logabs)


def custom_sqrt(x):
    """Zero-safe sqrt: value 0 AND derivative 0 at x == 0, so autodiff
    through coincident-point distances stays finite (reference
    torch_backend.py:783-789 semantics)."""
    return _safe_sqrt(asarray(x))


def scalar_safe(f):
    """Wrap f so scalar / list / numpy inputs are converted once
    (reference torch_backend.py:282-294; jnp ops mostly do this already,
    kept for API parity with user code that decorates its own fns)."""

    def f_(x):
        return f(asarray(x))

    return f_


def axis_to_dim(f):
    """Identity adapter: jax.numpy reductions take ``axis`` natively;
    the torch backend needed an axis->dim translation
    (torch_backend.py:375-383)."""
    return f


class Normal:
    """Minimal torch.distributions.Normal-parity wrapper over the
    ``normal`` namespace (reference torch_backend.py:116)."""

    def __init__(self, loc, scale):
        # jnp.asarray (not the list-promoting asarray): torch keeps
        # scalar loc/scale 0-d, so sample((3,)) has shape (3,)
        self.loc = jnp.asarray(loc, dtype=_dtype)
        self.scale = jnp.asarray(scale, dtype=_dtype)

    @property
    def mean(self):
        return self.loc

    @property
    def stddev(self):
        return self.scale

    @property
    def variance(self):
        return self.scale**2

    def log_prob(self, x):
        # jnp.asarray keeps python scalars 0-d, as torch does
        return normal.logpdf(jnp.asarray(x, dtype=_dtype), self.loc, self.scale)

    def cdf(self, x):
        return normal.cdf(jnp.asarray(x, dtype=_dtype), self.loc, self.scale)

    def icdf(self, q):
        return normal.ppf(jnp.asarray(q, dtype=_dtype), self.loc, self.scale)

    def sample(self, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            self.loc.shape, self.scale.shape
        )
        return self.loc + self.scale * jax.random.normal(
            next_key(), shape, dtype=_dtype
        )

    rsample = sample


class MultivariateNormal:
    """Minimal torch.distributions.MultivariateNormal-parity wrapper
    (reference torch_backend.py:115)."""

    def __init__(self, loc, covariance_matrix):
        self.loc = jnp.atleast_1d(jnp.asarray(loc, dtype=_dtype))
        self.covariance_matrix = jnp.asarray(covariance_matrix, dtype=_dtype)

    @property
    def mean(self):
        return self.loc

    def log_prob(self, x):
        return multivariate_normal.logpdf(
            asarray(x), self.loc, self.covariance_matrix
        )

    def sample(self, sample_shape=()):
        return jax.random.multivariate_normal(
            next_key(),
            self.loc,
            self.covariance_matrix,
            shape=tuple(sample_shape),
            dtype=_dtype,
            method="svd",
        )

    rsample = sample
