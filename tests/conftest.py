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
# processes by default: stale XLA:CPU AOT entries are not just noisy,
# a poisoned entry deadlocked cross-module collectives and SIGABRT'd
# the whole suite in round 3.  Opt in ONLY with a fresh per-run temp
# dir: repeated programs within this pytest session still hit the
# cache, but no entry from a previous run (or another machine via a
# shared home) can ever be loaded.
import tempfile

os.environ.setdefault(
    "GPMP_COMPILE_CACHE",
    tempfile.mkdtemp(prefix="gpmp-tpu-xla-tests-"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices())
)
