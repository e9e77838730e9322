"""Profiling/tracing utilities.

The reference's observability is ad-hoc CUDA-event timing
(flashattention_pytorch.py:888-928) and perf_counter loops
(benchmarks/bench_utils.py:124-146). The TPU-native equivalents:

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard/Perfetto trace of device execution.
- ``compiled_cost(fn, *args)``: XLA's own cost model for a jitted function
  (FLOPs, bytes accessed) — the static analogue of the reference's
  ``compute_tflops`` formula, but measured from the compiled HLO.
- ``timed(fn, *args)``: one honest wall-clock measurement through the TPU
  tunnel (on-device iteration loop; see bench.py for why naive timing lies).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable

import jax
import numpy as np


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Remote Mosaic compiles through the axon tunnel cost 30 s-10+ min and
    intermittently wedge entirely (one 2026-08-17 window completed zero
    compiles in 9 minutes). The persistent cache works through the axon
    platform (verified cross-process: 0.57 s hit vs 2.25 s cold), so every
    successful compile — from a bench, a tuning cell, or a verify drive —
    makes later runs of the same executable instant and immune to wedged
    windows. Returns the cache dir, or None if it could not be enabled.
    """
    cache_dir = path or os.environ.get(
        "FAT_JAX_CACHE",
        os.path.expanduser("~/.cache/flashattention_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # an optimization — never fail the caller over it
        return None
    return cache_dir


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block: ``with trace("/tmp/jaxtrace"): f()``. View with
    TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *args, **kwargs) -> dict[str, Any]:
    """XLA cost analysis of jit(fn)(*args): {'flops': ..., 'bytes accessed':
    ..., ...}. Keys come from XLA and vary by backend/version."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # some backends return [dict]
        cost = cost[0] if cost else {}
    return dict(cost) if cost else {}


def timed(fn: Callable, *args, iters: int = 20, trials: int = 3) -> float:
    """Best per-iteration seconds of ``iters`` chained on-device calls.
    ``fn(*args)``'s first output must be shape/dtype-compatible with
    ``args[0]`` (it is fed back as the first argument)."""
    from jax import lax

    a0 = args[0]

    @jax.jit
    def loop(x, *rest):
        def body(i, acc):
            out = fn(acc, *rest)
            first = out[0] if isinstance(out, (tuple, list)) else out
            return first.astype(a0.dtype).reshape(a0.shape)
        return lax.fori_loop(0, iters, body, x)

    out = loop(*args)
    _ = np.asarray(out).ravel()[:8]
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = loop(*args)
        _ = np.asarray(out).ravel()[:8]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
