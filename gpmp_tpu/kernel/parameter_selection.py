# gpmp_tpu/kernel/parameter_selection.py
"""Selection criteria + SciPy optimization driver.

Reference semantics: /root/reference/gpmp/kernel/parameter_selection.py.
TPU design: the criterion and its gradient are one jitted
``jax.value_and_grad`` program (built by gnp.DifferentiableSelectionCriterion);
SciPy SLSQP / L-BFGS-B runs on the host and calls into the compiled
program.  History recording, local bounds, and best-seen-fallback follow
the reference driver (parameter_selection.py:128-276).
"""

import functools
import time

import numpy as np
from scipy.optimize import minimize

import jax
import jax.numpy as jnp

import gpmp_tpu.num as gnp
from .init import (
    anisotropic_parameters_initial_guess,
    anisotropic_parameters_initial_guess_constant_mean,
)
from .prior_defaults import resolve_prior_defaults_for_selection
from .prior_helpers import (
    resolve_covparam0_prior_and_init,
    resolve_covparam0_roles_for_update,
    resolve_logsigma2_logrho_prior_args,
)
from .priors import (
    neg_log_restricted_posterior_logsigma2_and_logrho_prior,
    neg_log_restricted_posterior_logsigma2_prior,
    neg_log_restricted_posterior_power_laws_prior,
)
from .utils import check_xi_zi_or_loader


# ----------------- criterion program cache (repeat fits) --------------
_UNKEYABLE = object()


def _key_token(v):
    """Hashable, value-faithful token for a bound criterion argument."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (tuple, list)):
        toks = tuple(_key_token(u) for u in v)
        return _UNKEYABLE if _UNKEYABLE in toks else ("seq", toks)
    try:
        arr = np.asarray(v)
    except Exception:
        return _UNKEYABLE
    if arr.dtype == object:
        return _UNKEYABLE
    return ("arr", arr.shape, str(arr.dtype), arr.tobytes())


def _criterion_identity(fn):
    """Stable identity token for a criterion callable, or None.

    Recognized: state-free functions defined in gpmp_tpu modules (no
    closure cells), ``functools.partial`` of such functions with
    tokenizable bound values, and callables explicitly opting in with
    ``_gpmp_program_cache = True``.  Anything else -- user lambdas and
    per-fit closures -- returns None, which disables program caching
    for that fit (each fresh closure would never be seen again, and a
    closure can capture state the key cannot see).  The token holds a
    strong reference to the function object, so its identity is never
    recycled by the allocator.
    """
    if isinstance(fn, functools.partial):
        base = _criterion_identity(fn.func)
        if base is None:
            return None
        args = tuple(_key_token(a) for a in fn.args)
        kws = tuple((k, _key_token(v)) for k, v in sorted(fn.keywords.items()))
        if _UNKEYABLE in args or any(v is _UNKEYABLE for _, v in kws):
            return None
        return ("partial", base, args, kws)
    module = getattr(fn, "__module__", "") or ""
    if not (getattr(fn, "_gpmp_program_cache", False)
            or module.startswith("gpmp_tpu")):
        return None
    if getattr(fn, "__closure__", None):
        return None
    return fn


def _criterion_program_key(model, selection_criterion, parameterized_mean,
                           meanparam_len, xi_j, zi_j):
    """Cache key for this fit's jitted criterion programs, or None.

    jax.jit's executable cache is keyed on function identity, and every
    fit builds fresh closures, so without this repeat fits retrace and
    re-hit the persistent compilation cache (seconds) instead of
    reusing the in-memory executable (instant).  The key pins
    everything the traced program reads besides its arguments: the
    criterion identity and bound hyperparameters, the model's
    covariance/mean callables and meantype, the meanparam baked into
    linear-predictor criteria, the prior-defaults registry (REMAP
    criteria consult it at trace time), data shapes/dtypes, and the
    resolved Cholesky engine (a trace-time env read -- flipping
    GPMP_CHOL_ENGINE must retrace, cf. the Model method cache).
    """
    ident = _criterion_identity(selection_criterion)
    if ident is None:
        return None
    from gpmp_tpu.core.model import Model as _Model

    if type(model) is not _Model:
        return None
    mp_tok = _key_token(getattr(model, "meanparam", None))
    if mp_tok is _UNKEYABLE:
        return None
    from gpmp_tpu.core.linalg import chol_engine
    from .prior_defaults import get_default_prior_hyperparameters

    defaults_tok = tuple(sorted(get_default_prior_hyperparameters().items()))
    return (
        ident,
        model.covariance,
        model.mean,
        getattr(model, "meantype", None),
        bool(parameterized_mean),
        int(meanparam_len),
        tuple(xi_j.shape),
        str(xi_j.dtype),
        tuple(zi_j.shape),
        str(zi_j.dtype),
        chol_engine(int(xi_j.shape[0])),
        mp_tok,
        defaults_tok,
    )


# ---------------------- criterion + gradient maker --------------------
def make_selection_criterion_with_gradient(
    model,
    selection_criterion,
    xi=None,
    zi=None,
    dataloader=None,
    batches_per_eval=0,
    parameterized_mean=False,
    meanparam_len=1,
):
    """Build the 4-callable optimizer protocol from a criterion function.

    criterion signatures: f(model, covparam, xi, zi), or
    f(model, meanparam, covparam, xi, zi) when parameterized_mean=True
    (the optimization vector is then [meanparam, covparam]).

    Returns (evaluate, evaluate_pre_grad, evaluate_no_grad, gradient).
    """
    data_source = check_xi_zi_or_loader(xi, zi, dataloader)

    if parameterized_mean:

        def crit_(param, xi_, zi_):
            meanparam = param[:meanparam_len]
            covparam = param[meanparam_len:]
            return selection_criterion(model, meanparam, covparam, xi_, zi_)

    else:

        def crit_(covparam, xi_, zi_):
            return selection_criterion(model, covparam, xi_, zi_)

    if data_source == "arrays":
        xi_j, zi_j = gnp.asarray(xi), gnp.asarray(zi)
        program_key = _criterion_program_key(
            model, selection_criterion, parameterized_mean, meanparam_len,
            xi_j, zi_j,
        )
        crit = gnp.DifferentiableSelectionCriterion(
            crit_, xi_j, zi_j, program_key=program_key
        )
    else:
        crit = gnp.BatchDifferentiableSelectionCriterion(
            crit_, dataloader, batches_per_eval=batches_per_eval
        )
    return crit.evaluate, crit.evaluate_pre_grad, crit.evaluate_no_grad, crit.gradient


# ------------------------------ optimizer -----------------------------
def autoselect_parameters(
    p0,
    criterion,
    gradient,
    bounds=None,
    bounds_auto=True,
    bounds_delta=10.0,
    silent=True,
    info=False,
    method="SLSQP",
    method_options=None,
):
    """Minimize a scalar criterion.

    method='SLSQP' / 'L-BFGS-B': SciPy on the host --
    - automatic local bounds p0 +- bounds_delta clipped to [-500, 500];
    - full history recording (params + criterion values);
    - best-seen fallback when the final SciPy iterate is worse;
    - linalg failures map to +inf so optimization continues.

    method='lbfgs-device': the fit runs on the accelerator as jitted
    lax.while_loop chunks (optax.lbfgs + zoom linesearch, projected
    onto the box after each update; chunking bounds single-program
    runtime below device-worker execution limits).  One host round-trip
    per chunk_size iterations instead of one per iteration.  The
    reference has no equivalent (its fits are SciPy-loop-bound,
    parameter_selection.py:253-260).  Requires ``criterion`` to be (or
    be recoverable as) a jax-traceable function; history is not
    recorded.  NOTE: pays one large XLA compilation of the full
    optimizer graph -- worthwhile for repeated fits (compilation
    cache) or directly-attached accelerators; for one-shot fits
    through a remote-compile tunnel the SciPy path is faster.

    Returns (p_opt, OptimizeResult-or-None).
    """
    if method_options is None:
        method_options = {}
    tic = time.time()

    safe_lower, safe_upper = -500, 500
    if bounds is None and bounds_auto:
        bounds = [
            (
                max(float(param) - bounds_delta, safe_lower),
                min(float(param) + bounds_delta, safe_upper),
            )
            for param in np.asarray(p0)
        ]

    if method == "lbfgs-device":
        return _autoselect_parameters_on_device(
            p0, criterion, bounds, info=info,
            method_options=method_options, tic=tic
        )

    history_params, history_criterion = [], []
    best_params, best_criterion = None, float("inf")

    def record(p, J):
        nonlocal best_params, best_criterion
        history_params.append(np.array(p, copy=True))
        history_criterion.append(J)
        if J < best_criterion:
            best_criterion, best_params = J, np.array(p, copy=True)

    warned_initial_inf = False

    def criterion_with_history(p):
        nonlocal warned_initial_inf
        try:
            J = float(criterion(p))
        except Exception as exc:
            if gnp._is_linalg_exception(exc):
                J = np.inf
            else:
                raise
        if (
            not warned_initial_inf
            and not history_criterion
            and not np.isfinite(J)
        ):
            warned_initial_inf = True
            from gpmp_tpu.config import get_logger

            get_logger().warning(
                "Selection criterion is +inf at the initial point "
                "(covariance not factorizable there: likely an "
                "ill-conditioned noise-free kernel or a bad covparam0); "
                "the optimizer cannot make progress from +inf. Consider "
                "an observation-noise term, a better covparam0, or "
                "GPMP_CHOL_ENGINE=f64."
            )
        record(p, J)
        return J

    def gradient_np(p):
        return np.asarray(gradient(p), dtype=float)

    options = {} if method == "L-BFGS-B" else {"disp": not silent}
    if method == "L-BFGS-B":
        # scipy >= 1.15 deprecates disp/iprint for L-BFGS-B
        options.update(
            dict(
                maxcor=20, ftol=1e-6, gtol=1e-5, eps=1e-8,
                maxfun=15000, maxiter=15000, maxls=40,
            )
        )
    elif method == "SLSQP":
        options.update(dict(ftol=1e-6, eps=1e-8, maxiter=15000))
    else:
        raise ValueError("Optimization method not implemented.")
    options.update(method_options)

    r = minimize(
        criterion_with_history,
        np.asarray(p0, dtype=float),
        method=method,
        jac=gradient_np,
        bounds=bounds,
        options=options,
    )

    if r.fun > best_criterion:
        r.x, r.fun, r.best_value_returned = best_params, best_criterion, False
    else:
        r.best_value_returned = True

    r.history_params = history_params
    r.history_criterion = history_criterion
    r.initial_params = np.asarray(p0, dtype=float)
    r.final_params = r.x
    r.bounds = bounds
    r.selection_criterion = criterion
    r.total_time = time.time() - tic

    return (r.x, r) if info else (r.x, None)


def _traceable_criterion(criterion):
    """Recover theta -> J(theta) as a jax-traceable function from a
    DifferentiableSelectionCriterion bound method (same recovery as
    mcmc/param_posterior.py)."""
    wrapper = getattr(criterion, "__self__", None)
    if wrapper is not None and hasattr(wrapper, "crit") and hasattr(
        wrapper, "x"
    ):
        fn, x, z = wrapper.crit, wrapper.x, wrapper.z
        return lambda p: jnp.asarray(fn(p, x, z)).reshape(())
    return lambda p: jnp.asarray(criterion(p)).reshape(())


def _autoselect_parameters_on_device(p0, criterion, bounds, info=False,
                                     method_options=None, tic=None):
    """Whole L-BFGS fit as one device program (see autoselect_parameters
    method='lbfgs-device')."""
    import optax
    import optax.tree_utils as otu

    # the loop runs in chunks of chunk_size iterations per dispatch:
    # one long single program can exceed device-worker execution limits
    # (observed: TPU worker crash beyond ~50-200 iterations of an
    # n=1000 REML graph), while per-iteration dispatch would pay one
    # host round-trip per L-BFGS step.  The optimizer state crosses the
    # host boundary between chunks; convergence is checked per chunk.
    opts = dict(maxiter=200, gtol=1e-5, ftol=1e-6, memory_size=20,
                chunk_size=25)
    opts.update(method_options or {})
    fun = _traceable_criterion(criterion)
    p0 = jnp.asarray(np.asarray(p0, dtype=float))
    if bounds is not None:
        lb = jnp.asarray([b[0] for b in bounds], dtype=p0.dtype)
        ub = jnp.asarray([b[1] for b in bounds], dtype=p0.dtype)
    else:
        lb = ub = None

    opt = optax.lbfgs(memory_size=int(opts["memory_size"]))
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        params = optax.apply_updates(params, updates)
        if lb is not None:
            params = jnp.clip(params, lb, ub)
        return params, state

    gtol = float(opts["gtol"])

    @jax.jit
    def run_chunk(params, state, chunk_end):
        def continuing(carry):
            _, st = carry
            count = otu.tree_get(st, "count")
            grad = otu.tree_get(st, "grad")
            err = otu.tree_norm(grad)
            return (count == 0) | (
                (count < chunk_end) & (err >= gtol) & jnp.isfinite(err)
            )

        return jax.lax.while_loop(continuing, step, (params, state))

    params, state = p0, opt.init(p0)
    maxiter = int(opts["maxiter"])
    chunk = max(1, int(opts["chunk_size"]))
    ftol = float(opts["ftol"])
    n_iter = 0
    prev_value = None
    for chunk_end in range(chunk, maxiter + chunk, chunk):
        chunk_end = min(chunk_end, maxiter)
        params, state = run_chunk(
            params, state, jnp.asarray(chunk_end)
        )
        n_iter = int(otu.tree_get(state, "count"))
        err = float(otu.tree_norm(otu.tree_get(state, "grad")))
        value = float(otu.tree_get(state, "value"))
        if n_iter < chunk_end or not np.isfinite(err) or err < gtol:
            break
        # SciPy-style relative-improvement stop across chunk boundaries
        if prev_value is not None and np.isfinite(value):
            if (prev_value - value) <= ftol * chunk * max(
                abs(value), abs(prev_value), 1.0
            ):
                break
        prev_value = value
        if chunk_end >= maxiter:
            break

    x = params
    x = np.asarray(x)
    J0 = float(fun(jnp.asarray(np.asarray(p0))))
    Jx = float(fun(jnp.asarray(x)))
    best_value_returned = True
    if not np.isfinite(Jx) or Jx > J0:
        x, Jx, best_value_returned = np.asarray(p0), J0, False

    from scipy.optimize import OptimizeResult

    r = OptimizeResult(
        x=x, fun=Jx, nit=int(n_iter), success=bool(np.isfinite(Jx)),
        message="lbfgs-device",
    )
    r.best_value_returned = best_value_returned
    r.history_params = [np.asarray(p0), x]
    r.history_criterion = [J0, Jx]
    r.initial_params = np.asarray(p0)
    r.final_params = x
    r.bounds = bounds
    r.selection_criterion = criterion
    r.total_time = time.time() - (tic if tic is not None else time.time())
    return (r.x, r) if info else (r.x, None)


# -------------------- high-level selection procedures ------------
def _subsampled_initial_guess(model, xi, zi, init_subsample):
    """Dense init heuristic on a deterministic subsample (mesh mode)."""
    xi_, zi_ = gnp.asarray(xi), gnp.asarray(zi)
    n = xi_.shape[0]
    m = min(int(init_subsample), n)
    idx = np.random.default_rng(0).permutation(n)[:m]
    return anisotropic_parameters_initial_guess(
        model, xi_[idx], zi_[idx].reshape(-1), None
    )


def select_parameters_with_criterion(
    model,
    criterion,
    xi=None,
    zi=None,
    dataloader=None,
    meanparam0=None,
    covparam0=None,
    parameterized_mean=False,
    meanparam_len=1,
    info=False,
    verbosity=0,
    *,
    bounds=None,
    bounds_auto=True,
    bounds_delta=10.0,
    batches_per_eval=0,
    method="SLSQP",
    method_options=None,
    mesh=None,
    shard_block=None,
    init_subsample=2048,
):
    """Optimize model parameters under a user-supplied criterion;
    writes the optimum back into the model.  With info=True, returns a
    diagnostics dict with history/timing/criterion callables.

    Large-n sharded mode (no reference counterpart): pass a
    ``jax.sharding.Mesh`` (axis name 'shard') and the model is wrapped
    in ``gpmp_tpu.parallel.ShardedModelView``, so any criterion built on
    the model's likelihood methods row-shards the (n, n) covariance over
    the mesh (distributed blocked Cholesky underneath).  When
    ``covparam0`` is None, the init heuristic runs on a deterministic
    subsample of ``init_subsample`` points (the dense heuristic would
    materialize the full gram)."""
    if method_options is None:
        method_options = {}

    tic = time.time()
    _source = check_xi_zi_or_loader(xi, zi, dataloader)

    base_model = model
    if mesh is not None:
        if dataloader is not None:
            raise ValueError("mesh mode takes arrays, not a dataloader")
        from gpmp_tpu.parallel.view import ShardedModelView

        model = ShardedModelView(base_model, mesh, block=shard_block)
        if covparam0 is None:
            covparam0 = _subsampled_initial_guess(
                base_model, xi, zi, init_subsample
            )

    if covparam0 is None:
        covparam0 = anisotropic_parameters_initial_guess(model, xi, zi, dataloader)

    if parameterized_mean:
        if meanparam0 is None:
            raise ValueError("meanparam0 must be provided when parameterized_mean=True.")
        param0 = gnp.concatenate([gnp.asarray(meanparam0), gnp.asarray(covparam0)])
    else:
        param0 = covparam0

    crit, crit_pre_grad, crit_no_grad, crit_grad = (
        make_selection_criterion_with_gradient(
            model,
            criterion,
            xi,
            zi,
            dataloader,
            batches_per_eval=batches_per_eval,
            parameterized_mean=parameterized_mean,
            meanparam_len=meanparam_len,
        )
    )

    silent = not (verbosity == 2)
    if verbosity == 1:
        print("Parameter selection using custom criterion...")

    param_opt, info_ret = autoselect_parameters(
        gnp.to_np(gnp.asarray(param0)),
        crit_pre_grad,
        crit_grad,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        silent=silent,
        info=True,
        method=method,
        method_options=method_options,
    )

    if verbosity == 1:
        print("done.")

    if parameterized_mean:
        meanparam_opt = param_opt[:meanparam_len]
        covparam_opt = param_opt[meanparam_len:]
        model.meanparam = gnp.asarray(meanparam_opt)
    else:
        meanparam_opt = None
        covparam_opt = param_opt
    model.covparam = gnp.asarray(covparam_opt)

    if info:
        info_ret["meanparam0"] = gnp.to_np(gnp.asarray(meanparam0)) if parameterized_mean else None
        info_ret["covparam0"] = gnp.to_np(gnp.asarray(covparam0))
        info_ret["meanparam"] = meanparam_opt
        info_ret["covparam"] = covparam_opt
        info_ret["selection_criterion"] = crit
        info_ret["selection_criterion_nograd"] = crit_no_grad
        info_ret["time"] = time.time() - tic
        return base_model, info_ret
    return base_model, None


def update_parameters_with_criterion(
    model,
    criterion,
    xi=None,
    zi=None,
    dataloader=None,
    parameterized_mean=False,
    meanparam_len=1,
    info=False,
    *,
    bounds=None,
    bounds_auto=True,
    bounds_delta=10.0,
    method="SLSQP",
    method_options=None,
    mesh=None,
    shard_block=None,
):
    """Re-optimize from the current model parameters."""
    return select_parameters_with_criterion(
        model,
        criterion,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        meanparam0=model.meanparam if parameterized_mean else None,
        covparam0=model.covparam,
        parameterized_mean=parameterized_mean,
        meanparam_len=meanparam_len,
        info=info,
        verbosity=0,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
        mesh=mesh,
        shard_block=shard_block,
    )


# ------------------------- objective wrappers -------------------------
def negative_log_likelihood_zero_mean(model, covparam, xi, zi):
    """ML criterion for zero-mean models."""
    return model.negative_log_likelihood_zero_mean(covparam, xi, zi)


def negative_log_likelihood(model, meanparam, covparam, xi, zi):
    """ML criterion with mean parameters."""
    return model.negative_log_likelihood(meanparam, covparam, xi, zi)


def negative_log_restricted_likelihood(model, covparam, xi, zi):
    """REML criterion."""
    return model.negative_log_restricted_likelihood(covparam, xi, zi)


# --------------------------- ML constant mean ---------------------------
def select_parameters_with_ml_constant_mean(
    model,
    xi=None,
    zi=None,
    dataloader=None,
    meanparam0=None,
    covparam0=None,
    info=False,
    verbosity=0,
    *,
    bounds=None,
    bounds_auto=True,
    bounds_delta=10.0,
    method="SLSQP",
    method_options=None,
):
    """Joint ML over [constant meanparam, covparam]
    (model.meantype must be 'parameterized')."""
    if getattr(model, "meantype", None) != "parameterized":
        raise ValueError(
            "select_parameters_with_ml_constant_mean requires a model with "
            "meantype='parameterized'."
        )

    if meanparam0 is None or covparam0 is None:
        meanparam0_guess, covparam0_guess = (
            anisotropic_parameters_initial_guess_constant_mean(model, xi, zi, dataloader)
        )
        if meanparam0 is None:
            meanparam0 = meanparam0_guess
        if covparam0 is None:
            covparam0 = covparam0_guess

    meanparam0 = gnp.asarray(meanparam0).reshape(-1)
    if int(meanparam0.shape[0]) != 1:
        raise ValueError("meanparam0 must contain exactly one constant-mean parameter.")
    covparam0 = gnp.asarray(covparam0).reshape(-1)

    return select_parameters_with_criterion(
        model,
        negative_log_likelihood,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        meanparam0=meanparam0,
        covparam0=covparam0,
        parameterized_mean=True,
        meanparam_len=1,
        info=info,
        verbosity=verbosity,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
    )


def update_parameters_with_ml_constant_mean(
    model, xi=None, zi=None, dataloader=None, info=False, *,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
):
    return select_parameters_with_ml_constant_mean(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        meanparam0=model.meanparam,
        covparam0=model.covparam,
        info=info,
        verbosity=0,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
    )


# --------------------------------- REML ---------------------------------
def _reml_criterion(m, covparam, x, z):
    """REML criterion routed through the model METHOD so a
    ShardedModelView (mesh mode) can intercept with the sharded
    implementation; identical to the module function on a plain Model.
    Module-level (not a per-fit closure) so repeat fits share the
    jitted program (_criterion_program_key)."""
    return m.negative_log_restricted_likelihood(covparam, x, z)


def select_parameters_with_reml(
    model, xi=None, zi=None, dataloader=None, covparam0=None, info=False,
    verbosity=0, *,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
    mesh=None, shard_block=None, init_subsample=2048,
):
    """Select covariance parameters with REML.

    Large-n sharded mode (no reference counterpart): pass a
    ``jax.sharding.Mesh`` (axis name 'shard') and the criterion becomes
    ``gpmp_tpu.parallel.sharded_negative_log_restricted_likelihood`` --
    the (n, n) covariance is row-sharded over the mesh and factored by
    the distributed blocked Cholesky, so n is bounded by aggregate HBM.
    When ``covparam0`` is None, the init heuristic runs on a
    deterministic subsample of ``init_subsample`` points (the dense
    heuristic would materialize the full gram).
    """
    return select_parameters_with_criterion(
        model,
        _reml_criterion,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        info=info,
        verbosity=verbosity,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
        mesh=mesh,
        shard_block=shard_block,
        init_subsample=init_subsample,
    )


def update_parameters_with_reml(
    model, xi=None, zi=None, dataloader=None, info=False, *,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
    mesh=None, shard_block=None,
):
    return update_parameters_with_criterion(
        model,
        _reml_criterion,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        info=info,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
        mesh=mesh,
        shard_block=shard_block,
    )


# ---------------------------- REMAP (default prior) ----------------------------
def select_parameters_with_remap(
    model, xi=None, zi=None, dataloader=None, covparam0=None,
    covparam0_init=None, info=False, verbosity=0, **kwargs,
):
    """Alias of select_parameters_with_remap_gaussian_logsigma2_and_logrho_prior."""
    return select_parameters_with_remap_gaussian_logsigma2_and_logrho_prior(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_init=covparam0_init,
        info=info,
        verbosity=verbosity,
        **kwargs,
    )


def update_parameters_with_remap(
    model, xi=None, zi=None, dataloader=None, info=False, verbosity=0, **kwargs
):
    """Alias of update_parameters_with_remap_gaussian_logsigma2_and_logrho_prior."""
    return update_parameters_with_remap_gaussian_logsigma2_and_logrho_prior(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        info=info,
        verbosity=verbosity,
        **kwargs,
    )


# --------------------- REMAP with power laws prior  ----------------------
def select_parameters_with_remap_with_power_laws_prior(
    model, xi=None, zi=None, dataloader=None, covparam0=None, info=False,
    verbosity=0, *,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
):
    return select_parameters_with_criterion(
        model,
        neg_log_restricted_posterior_power_laws_prior,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        info=info,
        verbosity=verbosity,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
    )


def update_parameters_with_remap_with_power_laws_prior(
    model, xi=None, zi=None, dataloader=None, info=False, *,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
):
    return update_parameters_with_criterion(
        model,
        neg_log_restricted_posterior_power_laws_prior,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        info=info,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
    )


# --------------------- REMAP with gaussian prior on logsigma2  --------------------
def select_parameters_with_remap_gaussian_logsigma2(
    model, xi=None, zi=None, dataloader=None, covparam0=None, info=False,
    verbosity=0, *,
    covparam0_prior=None, prior_gamma=None, prior_sigma2_coverage=None,
    covparam0_init=None,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
):
    """REMAP with Gaussian prior on log(sigma2) anchored at covparam0_prior[0]."""
    covparam0_prior, covparam0_init = resolve_covparam0_prior_and_init(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_prior=covparam0_prior,
        covparam0_init=covparam0_init,
    )
    prior_gamma, prior_sigma2_coverage, _, _ = resolve_prior_defaults_for_selection(
        xi=xi,
        dataloader=dataloader,
        gamma=prior_gamma,
        sigma2_coverage=prior_sigma2_coverage,
    )
    prior_log_sigma2_0 = covparam0_prior[0]

    # functools.partial (not a closure) so _criterion_program_key can see
    # the bound hyperparameter values and repeat fits share the program
    criterion = functools.partial(
        neg_log_restricted_posterior_logsigma2_prior,
        log_sigma2_0=prior_log_sigma2_0,
        gamma=prior_gamma,
        sigma2_coverage=prior_sigma2_coverage,
    )

    return select_parameters_with_criterion(
        model,
        criterion,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0_init,
        info=info,
        verbosity=verbosity,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
    )


def update_parameters_with_remap_gaussian_logsigma2(
    model, xi=None, zi=None, dataloader=None, info=False, verbosity=0, *,
    covparam0=None, covparam0_prior=None, covparam0_init=None,
    prior_gamma=None, prior_sigma2_coverage=None,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
):
    covparam0_prior, covparam0_init = resolve_covparam0_roles_for_update(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_prior=covparam0_prior,
        covparam0_init=covparam0_init,
    )
    return select_parameters_with_remap_gaussian_logsigma2(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_prior=covparam0_prior,
        covparam0_init=covparam0_init,
        info=info,
        verbosity=verbosity,
        prior_gamma=prior_gamma,
        prior_sigma2_coverage=prior_sigma2_coverage,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
    )


# ------------------ REMAP with priors on logsigma2 and logrho  -------------------
def select_parameters_with_remap_gaussian_logsigma2_and_logrho_prior(
    model, xi=None, zi=None, dataloader=None, covparam0=None, info=False,
    verbosity=0, *,
    covparam0_prior=None, prior_gamma=None, prior_sigma2_coverage=None,
    prior_rho_min_range_factor=None, prior_logrho_min=None,
    prior_log_sigma2_0=None, prior_logrho_0=None, prior_alpha=None,
    covparam0_init=None,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
    mesh=None, shard_block=None, init_subsample=2048,
):
    """Default REMAP: REML + Gaussian log-sigma2 prior + barrier/linear
    logrho prior (reference parameter_selection.py:1301-1483).

    Mesh mode (``mesh=`` a jax.sharding.Mesh): the model is wrapped in
    ShardedModelView so the REML term row-shards over the mesh; the
    prior-anchor heuristics run on a deterministic subsample of
    ``init_subsample`` points (they would otherwise build the full
    gram), while logrho_min keeps the full xi (O(n log n))."""
    if mesh is not None and covparam0 is None and covparam0_prior is None:
        covparam0 = _subsampled_initial_guess(model, xi, zi, init_subsample)
    covparam0_prior, covparam0_init = resolve_covparam0_prior_and_init(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_prior=covparam0_prior,
        covparam0_init=covparam0_init,
    )
    (
        prior_gamma,
        prior_sigma2_coverage,
        prior_alpha,
        prior_rho_min_range_factor,
        prior_log_sigma2_0,
        prior_logrho_0,
        prior_logrho_min,
    ) = resolve_logsigma2_logrho_prior_args(
        covparam0_prior=covparam0_prior,
        xi=xi,
        dataloader=dataloader,
        prior_gamma=prior_gamma,
        prior_sigma2_coverage=prior_sigma2_coverage,
        prior_alpha=prior_alpha,
        prior_rho_min_range_factor=prior_rho_min_range_factor,
        prior_log_sigma2_0=prior_log_sigma2_0,
        prior_logrho_0=prior_logrho_0,
        prior_logrho_min=prior_logrho_min,
    )

    # functools.partial (not a closure) so _criterion_program_key can see
    # the bound hyperparameter values and repeat fits share the program
    criterion = functools.partial(
        neg_log_restricted_posterior_logsigma2_and_logrho_prior,
        log_sigma2_0=prior_log_sigma2_0,
        gamma=prior_gamma,
        sigma2_coverage=prior_sigma2_coverage,
        logrho_min=prior_logrho_min,
        logrho_0=prior_logrho_0,
        alpha=prior_alpha,
    )

    return select_parameters_with_criterion(
        model,
        criterion,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0_init,
        info=info,
        verbosity=verbosity,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
        mesh=mesh,
        shard_block=shard_block,
        init_subsample=init_subsample,
    )


def update_parameters_with_remap_gaussian_logsigma2_and_logrho_prior(
    model, xi=None, zi=None, dataloader=None, info=False, verbosity=0, *,
    covparam0=None, covparam0_prior=None, covparam0_init=None,
    prior_gamma=None, prior_sigma2_coverage=None,
    prior_rho_min_range_factor=None, prior_logrho_min=None,
    prior_log_sigma2_0=None, prior_logrho_0=None, prior_alpha=None,
    bounds=None, bounds_auto=True, bounds_delta=10.0,
    method="SLSQP", method_options=None,
    mesh=None, shard_block=None,
):
    covparam0_prior, covparam0_init = resolve_covparam0_roles_for_update(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_prior=covparam0_prior,
        covparam0_init=covparam0_init,
    )
    return select_parameters_with_remap_gaussian_logsigma2_and_logrho_prior(
        model,
        xi=xi,
        zi=zi,
        dataloader=dataloader,
        covparam0=covparam0,
        covparam0_prior=covparam0_prior,
        covparam0_init=covparam0_init,
        info=info,
        verbosity=verbosity,
        prior_gamma=prior_gamma,
        prior_sigma2_coverage=prior_sigma2_coverage,
        prior_rho_min_range_factor=prior_rho_min_range_factor,
        prior_logrho_min=prior_logrho_min,
        prior_log_sigma2_0=prior_log_sigma2_0,
        prior_logrho_0=prior_logrho_0,
        prior_alpha=prior_alpha,
        bounds=bounds,
        bounds_auto=bounds_auto,
        bounds_delta=bounds_delta,
        method=method,
        method_options=method_options,
        mesh=mesh,
        shard_block=shard_block,
    )
