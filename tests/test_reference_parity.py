# tests/test_reference_parity.py
"""Direct numerical parity vs the upstream reference package.

Runs the reference (``/root/reference``, NumPy backend) in a subprocess on
pinned data and asserts that gpmp_tpu reproduces NLL / REML / predict / LOO
to 1e-8 (SURVEY §4 item (a); reference surfaces
gpmp/core/likelihood.py:18-129 and gpmp/core/kriging.py:59-199).

The subprocess isolation matters: the reference configures its own backend
globals at import, and both packages expose a ``gpmp``-style module tree.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.core import likelihood

REFERENCE_DIR = "/root/reference"
P_SMOOTH = 2
SIZES = [6, 200, 1000]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "gpmp")),
    reason="reference package not available",
)

# Both sides must build bit-identical inputs: same generator, same order.
_DATA_SRC = textwrap.dedent(
    """
    def make_data(n, d=2, seed=1234):
        import numpy as _np
        rng = _np.random.default_rng(seed + n)
        xi = rng.uniform(size=(n, d))
        zi = _np.sin(4.0 * xi[:, 0]) + 0.7 * xi[:, 1] ** 2 + 0.1 * rng.normal(size=n)
        xt = rng.uniform(size=(16, d))
        # rho = 0.15 keeps cond(K) moderate at n=1000 so 1e-8 parity is
        # a test of convention, not of round-off amplification
        covparam = _np.array([_np.log(0.8)] + [_np.log(1.0 / 0.15)] * d)
        return xi, zi, xt, covparam
    """
)

_REF_SCRIPT = _DATA_SRC + textwrap.dedent(
    """
    import json, sys
    import numpy as np
    import gpmp as gp
    import gpmp.num as gnp

    P = {p}

    def constant_mean(x, param):
        return gnp.ones((x.shape[0], 1))

    def kernel_fn(x, y, covparam, pairwise=False):
        return gp.kernel.maternp_covariance(x, y, P, covparam, pairwise)

    out = {{}}
    for n in {sizes}:
        xi, zi, xt, covparam = make_data(n)
        rec = {{}}

        m0 = gp.core.Model(None, kernel_fn, meantype="zero", covparam=covparam)
        rec["nll"] = float(m0.negative_log_likelihood_zero_mean(covparam, xi, zi))
        zpm0, zpv0 = m0.predict(xi, zi, xt, convert_out=True)
        rec["zpm0"] = np.asarray(zpm0).ravel().tolist()
        rec["zpv0"] = np.asarray(zpv0).ravel().tolist()

        m1 = gp.core.Model(constant_mean, kernel_fn,
                           meantype="linear_predictor", covparam=covparam)
        rec["reml"] = float(m1.negative_log_restricted_likelihood(covparam, xi, zi))
        zpm1, zpv1 = m1.predict(xi, zi, xt, convert_out=True)
        rec["zpm1"] = np.asarray(zpm1).ravel().tolist()
        rec["zpv1"] = np.asarray(zpv1).ravel().tolist()

        zloo, s2loo, eloo = m1.loo(xi, zi, convert_out=True)
        rec["zloo"] = np.asarray(zloo).ravel().tolist()
        rec["s2loo"] = np.asarray(s2loo).ravel().tolist()
        rec["eloo"] = np.asarray(eloo).ravel().tolist()

        out[str(n)] = rec

    print("PARITY_JSON:" + json.dumps(out))
    """
)

exec(_DATA_SRC)  # defines make_data for the gpmp_tpu side


@pytest.fixture(scope="module")
def reference_values():
    env = dict(os.environ)
    env["GPMP_BACKEND"] = "numpy"
    env["PYTHONPATH"] = REFERENCE_DIR
    script = _REF_SCRIPT.format(p=P_SMOOTH, sizes=SIZES)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600, env=env, cwd="/tmp",
    )
    assert proc.returncode == 0, f"reference run failed:\n{proc.stderr[-3000:]}"
    payload = [ln for ln in proc.stdout.splitlines() if ln.startswith("PARITY_JSON:")]
    assert payload, f"no payload in reference output:\n{proc.stdout[-2000:]}"
    return json.loads(payload[-1][len("PARITY_JSON:"):])


def _constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def _kernel_fn(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, P_SMOOTH, covparam, pairwise)


def _close(ours, ref, what, n, tol=1e-8):
    ours = np.asarray(gnp.to_np(ours), dtype=float).ravel()
    ref = np.asarray(ref, dtype=float).ravel()
    np.testing.assert_allclose(
        ours, ref, rtol=tol, atol=tol, err_msg=f"{what} mismatch at n={n}"
    )


@pytest.mark.parametrize("n", SIZES)
def test_zero_mean_nll_and_predict_match_reference(reference_values, n):
    xi, zi, xt, covparam = make_data(n)  # noqa: F821
    rec = reference_values[str(n)]
    model = gp.Model(None, _kernel_fn, meantype="zero", covparam=covparam)
    nll = model.negative_log_likelihood_zero_mean(covparam, xi, zi)
    _close(nll, rec["nll"], "zero-mean NLL", n)
    zpm, zpv = model.predict(xi, zi, xt)
    _close(zpm, rec["zpm0"], "zero-mean posterior mean", n)
    _close(zpv, rec["zpv0"], "zero-mean posterior variance", n)


@pytest.mark.parametrize("n", SIZES)
def test_reml_and_universal_kriging_match_reference(reference_values, n):
    xi, zi, xt, covparam = make_data(n)  # noqa: F821
    rec = reference_values[str(n)]
    model = gp.Model(_constant_mean, _kernel_fn,
                     meantype="linear_predictor", covparam=covparam)
    reml = likelihood.negative_log_restricted_likelihood(model, covparam, xi, zi)
    _close(reml, rec["reml"], "REML criterion", n)
    zpm, zpv = model.predict(xi, zi, xt)
    _close(zpm, rec["zpm1"], "UK posterior mean", n)
    _close(zpv, rec["zpv1"], "UK posterior variance", n)


@pytest.mark.parametrize("n", SIZES)
def test_loo_matches_reference(reference_values, n):
    xi, zi, xt, covparam = make_data(n)  # noqa: F821
    rec = reference_values[str(n)]
    model = gp.Model(_constant_mean, _kernel_fn,
                     meantype="linear_predictor", covparam=covparam)
    zloo, s2loo, eloo = model.loo(xi, zi)
    _close(zloo, rec["zloo"], "LOO mean", n)
    _close(s2loo, rec["s2loo"], "LOO variance", n)
    _close(eloo, rec["eloo"], "LOO residual", n)
