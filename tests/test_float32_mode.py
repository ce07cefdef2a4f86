# tests/test_float32_mode.py
"""GPMP_DTYPE=float32 fast mode (config.py float32 support -- the
reference rejects float32, gpmp_tpu adds it as the TPU-native fast
mode).  dtype is a process-level switch (jax_enable_x64), so the flow
runs in a subprocess."""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["GPMP_DTYPE"] = "float32"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import gpmp_tpu as gp
import gpmp_tpu.num as gnp

assert gnp.asarray(np.ones(3)).dtype == gnp.float32

def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))

def kernel(x, y, covparam, pairwise=False):
    return gp.kernel.maternp_covariance(x, y, 2, covparam, pairwise)

xt = gp.misc.designs.regulargrid(1, 100, [[-1], [1]])
zt = gp.misc.testfunctions.twobumps(xt)
xi = gp.misc.designs.ldrandunif(1, 10, [[-1], [1]], seed=3)
zi = gp.misc.testfunctions.twobumps(xi)
model = gp.Model(constant_mean, kernel)
model, info = gp.kernel.select_parameters_with_reml(model, xi, zi, info=True)
zpm, zpv = model.predict(xi, zi, xt)
assert np.asarray(zpm).dtype == np.float32
rmse = float(np.sqrt(np.mean((np.asarray(zpm) - zt.ravel()) ** 2)))
assert np.isfinite(rmse) and rmse < 0.6, rmse
zloo, s2loo, eloo = model.loo(xi, zi)
assert np.all(np.isfinite(np.asarray(s2loo)))
print("F32OK", rmse)
"""


def test_float32_mode_end_to_end():
    env = dict(os.environ)
    env.pop("GPMP_CHOL_ENGINE", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert "F32OK" in out.stdout, (out.stdout, out.stderr[-2000:])
