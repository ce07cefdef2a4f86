# tests/test_compile_cache.py
"""Persistent compile-cache policy regression tests (round-3 postmortem).

Round 3's headline defect: a stale persistent XLA:CPU AOT cache entry
(written by an earlier policy generation) desynchronized cross-module
collectives in the sharded-REML example and SIGABRT'd pytest at test
49/194.  These tests pin the policy that prevents a recurrence:

1. plain CPU processes never install the cache by default (regardless
   of whether jax_platforms is pinned to "cpu" or simply unset);
2. an explicit ``GPMP_COMPILE_CACHE=<dir>`` opt-in is isolated under a
   machine-fingerprint + format-version leaf, so entries can never
   cross hosts (shared NFS home) or cache-policy generations;
3. a corrupted cache entry degrades to recompiling -- it can never
   abort or mis-execute a run.

Each scenario needs its own import of gpmp_tpu.num (the policy runs at
import time), so they execute in subprocesses.
"""

import os
import subprocess
import sys

import pytest


def _run(code, env_overrides, timeout=300):
    env = dict(os.environ)
    # hermetic: start from no cache spec, no inherited platform pin
    env.pop("GPMP_COMPILE_CACHE", None)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


_PROBE = """
import jax
jax.config.update("jax_platforms", "cpu")
import gpmp_tpu.num as gnp
print("CACHEDIR=" + repr(getattr(jax.config, "jax_compilation_cache_dir", None)))
"""


def test_cpu_process_installs_no_cache_by_default():
    r = _run(_PROBE, {"JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("CACHEDIR=")][0]
    assert line == "CACHEDIR=None" or line == "CACHEDIR=''", (
        "CPU-only process must not install a persistent cache: " + line
    )


def test_unset_platform_cpu_host_installs_no_cache(monkeypatch):
    # A plain CPU host typically has jax_platforms unset; the resolved
    # backend is cpu.  The cache must stay off there too (ADVICE r3).
    code = """
import os
import jax
import gpmp_tpu.num as gnp
print("CACHEDIR=" + repr(getattr(jax.config, "jax_compilation_cache_dir", None)))
"""
    env = {"JAX_PLATFORMS": ""}
    # This environment's sitecustomize may pin an axon TPU platform at
    # interpreter start; neutralize it so the subprocess models a plain
    # CPU host.  PYTHONNOUSERSITE etc. don't stop sitecustomize, so we
    # detect and skip instead of fighting it.
    probe = _run(
        "import jax; print(str(getattr(jax.config, 'jax_platforms', '') or ''))",
        env,
    )
    platforms = (probe.stdout.strip().splitlines() or [""])[-1]
    if any(p.strip() and p.strip() != "cpu" for p in platforms.split(",")):
        pytest.skip("host pins a non-CPU platform at interpreter start: "
                    + platforms)
    r = _run(code, env)
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("CACHEDIR=")][0]
    assert line == "CACHEDIR=None" or line == "CACHEDIR=''", line


def test_explicit_cache_dir_gets_fingerprint_version_leaf(tmp_path):
    r = _run(_PROBE, {"GPMP_COMPILE_CACHE": str(tmp_path),
                      "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("CACHEDIR=")][0]
    cachedir = eval(line[len("CACHEDIR="):])
    assert cachedir is not None and cachedir != str(tmp_path), (
        "explicit cache dirs must be isolated under a fingerprint+version "
        "leaf, got " + line
    )
    assert os.path.dirname(cachedir) == str(tmp_path)
    leaf = os.path.basename(cachedir)
    assert "-v" in leaf, leaf  # <fingerprint>-v<format version>


_ROUNDTRIP = """
import jax
jax.config.update("jax_platforms", "cpu")
import gpmp_tpu.num as gnp
import jax.numpy as jnp

@jax.jit
def f(x):
    return (x @ x.T).sum()

out = f(jnp.arange(64.0).reshape(8, 8))
print("RESULT=" + repr(float(out)))
"""


def test_corrupted_cache_entry_degrades_to_recompile(tmp_path):
    """A cache must fall back to compiling, never abort (VERDICT r3 #1b)."""
    env = {"GPMP_COMPILE_CACHE": str(tmp_path), "JAX_PLATFORMS": "cpu"}

    r1 = _run(_ROUNDTRIP, env)
    assert r1.returncode == 0, r1.stderr
    # find the populated leaf and corrupt every entry in place
    leaves = [p for p in tmp_path.iterdir() if p.is_dir()]
    assert leaves, "cache leaf was not created"
    entries = [p for leaf in leaves for p in leaf.rglob("*") if p.is_file()]
    assert entries, "opt-in cache produced no entries"
    for p in entries:
        p.write_bytes(b"\x00poisoned\x00" * 16)

    r2 = _run(_ROUNDTRIP, env)
    assert r2.returncode == 0, (
        "corrupted cache entry must degrade to recompiling; process "
        "exited rc=%d\nstderr tail:\n%s" % (r2.returncode, r2.stderr[-2000:])
    )
    line1 = [l for l in r1.stdout.splitlines() if l.startswith("RESULT=")][0]
    line2 = [l for l in r2.stdout.splitlines() if l.startswith("RESULT=")][0]
    assert line1 == line2
