# tests/conftest.py
# Run tests on CPU with a virtual 8-device mesh so sharding tests work
# without TPU hardware.
#
# NOTE: this environment's sitecustomize registers an "axon" TPU proxy
# backend and sets jax_platforms="axon,cpu" at interpreter start, which
# overrides the JAX_PLATFORMS env var.  We therefore pin the platform via
# jax.config *after* import, before any backend is initialized.
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The package disables the persistent compile cache on CPU-only
# processes by default (serialized XLA:CPU executables trip the AOT
# loader's host-feature check with noisy -- though same-machine-safe --
# warnings; see num/__init__.py).  For the test suite the warnings are
# harmless and the cache cuts repeated-compile wall-clock a lot, so opt
# in explicitly with a machine-local dir.
os.environ.setdefault(
    "GPMP_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "gpmp_tpu",
                 "xla-tests"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices())
)
