# gpmp_tpu/misc/profiling.py
"""Device timing and profiling helpers.

The reference has no profiling utilities; on TPU, naive ``time.time()``
around a jitted call measures dispatch latency (and, through remote
tunnels, round-trip time), not device work.  These helpers implement
the two patterns that give honest numbers (SURVEY.md section 5: 'TPU
build: jax.profiler traces + block_until_ready timing harness'):

- ``timeit_device``: pipeline ``reps`` asynchronous dispatches with
  *varied* inputs (identical inputs can be served from request caches)
  and block once at the end;
- ``trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory.
"""

import time
from contextlib import contextmanager

import jax


def timeit_device(fn, *args, reps=10, warmup=1, vary=None):
    """Median-free pipelined wall-clock of ``fn(*args)`` per call.

    vary: optional ``vary(args, i) -> args`` transform applied per rep
    so each dispatch has distinct inputs (defeats result caching in
    remote-execution setups).  Returns seconds per call.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        a = vary(args, i) if vary is not None else args
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@contextmanager
def trace(log_dir):
    """``with trace('/tmp/jax-trace'): ...`` -- profile to TensorBoard."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
