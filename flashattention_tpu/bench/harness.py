"""Timing + records for the benchmark suite.

Record schema mirrors the reference's (benchmarks/bench_utils.py:161-208):
algo/backend/direction/shape/causal/dtype + mean_ms/pstdev_ms/tflops, with
``status`` ("ok" / "oom" / "failed") and OOM-catch-and-continue semantics
(bench_utils.py:227-229). Adds ``roofline_frac`` per chip.

Timing caveat (TPU-over-tunnel): ``block_until_ready`` does not synchronize
through the axon relay, so iterations are CHAINED (each call consumes the
previous output) and completion is forced by a host fetch.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import statistics
import time
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

V5E_PEAK = {"bfloat16": 197.0, "float32": 49.0, "int8": 394.0, "fp8": 394.0}


def peak_tflops(dtype: str, device_kind: str | None = None) -> float:
    """Per-chip peak for roofline accounting (v5e numbers by default)."""
    return V5E_PEAK.get(dtype, V5E_PEAK["bfloat16"])


def attention_flops(
    b: int, h: int, n: int, d: int, *, direction: str = "forward",
    causal: bool = False,
) -> float:
    """Reference FLOP model (bench_utils.py:210-215): fwd 4*B*H*N^2*d,
    bwd 2x fwd; causal halves the realized work."""
    f = 4.0 * b * h * n * n * d
    if direction == "backward":
        f *= 2.0
    elif direction == "both":
        f *= 3.0
    if causal:
        f /= 2.0
    return f


@dataclasses.dataclass
class BenchRecord:
    algo: str
    backend: str
    direction: str
    batch: int
    heads: int
    seqlen: int
    head_dim: int
    causal: bool
    dtype: str
    mean_ms: float = 0.0
    pstdev_ms: float = 0.0
    tflops: float = 0.0
    roofline_frac: float = 0.0
    peak_mem_mb: float = 0.0   # reference bench_utils.py:126-142 memory column
    # Where peak_mem_mb came from: "device_stats" (runtime memory_stats(),
    # the reference's max_memory_allocated analogue) or "xla_compiled"
    # (the executable's buffer-assignment peak via memory_analysis() —
    # exact per-program peak, works through the axon tunnel where runtime
    # stats return nothing; VERDICT r2 item 8).
    mem_source: str = ""
    status: str = "ok"
    error: str = ""

    def row(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


def device_peak_memory_mb() -> float:
    """Peak device-memory use of this process in MB (the reference's
    per-iter ``max_memory_allocated`` column, bench_utils.py:126-142;
    TPU-native via ``device.memory_stats()``). 0.0 where the runtime
    doesn't expose stats (CPU, some tunnel backends)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return 0.0
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use") or 0
        return float(peak) / 1e6
    except Exception:
        return 0.0


def benchmark_call(
    fn: Callable, args: tuple, *, chain_idx: int = 0, warmup: int = 1,
    iters: int = 60, trials: int = 3,
) -> tuple[float, float, float]:
    """Returns (t_iter_ms, pstdev_ms_across_per-length_samples,
    compiled_peak_mem_mb).

    Two-point overhead-corrected timing (bench.py methodology, round 2):
    chained calls run on device inside ONE jitted lax.fori_loop whose trip
    count is a TRACED argument; two lengths (iters, 9*iters) interleave and
    t_iter comes from the difference — the tunnel's 0.4-1.7 s per-dispatch
    constant cancels exactly. The chained value keeps args[chain_idx]'s
    shape/dtype.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    ref = args[chain_idx]

    # All arrays ride as jit ARGUMENTS: closed-over arrays embed as HLO
    # constants and can exceed the tunnel's compile-request size limit.
    @jax.jit
    def loop(n, a0, *rest):
        def one(i, a):
            full = list(rest[:chain_idx]) + [a] + list(rest[chain_idx:])
            out = fn(*full)
            first = out[0] if isinstance(out, (tuple, list)) else out
            return first.astype(ref.dtype).reshape(ref.shape)
        return lax.fori_loop(0, n, one, a0)

    rest = tuple(x for i, x in enumerate(args) if i != chain_idx)

    def run(n):
        t0 = time.perf_counter()
        out = loop(jnp.int32(n), ref, *rest)
        _ = np.asarray(out).ravel()[:4]
        return time.perf_counter() - t0

    run(2)  # compile + sync
    # Compiled-program peak memory (buffer assignment) for the memory
    # column — the persistent compile cache makes this second lower/compile
    # a cache hit; through the tunnel runtime memory_stats() is empty, so
    # this is the only exact per-config number available.
    mem_mb = 0.0
    try:
        ma = loop.lower(jnp.int32(2), ref, *rest).compile().memory_analysis()
        if ma is not None:
            mem_mb = float(ma.peak_memory_in_bytes) / 1e6
    except Exception:
        pass
    # Auto-scale the long length so the DIFFERENTIAL compute is >= ~2 s —
    # the overhead constant jitters by a few hundred ms between dispatches,
    # so a small delta (fast kernels / short seqs) would drown the signal.
    i1 = iters
    t1 = min(run(i1) for _ in range(2))
    i2 = 9 * i1
    t2 = run(i2)
    while t2 - t1 < 2.0 and i2 < 400_000:
        i2 *= 4
        t2 = run(i2)
    best = {i1: t1, i2: t2}
    samples = [t1 / i1 * 1e3, t2 / i2 * 1e3]
    for _t in range(max(trials - 1, 1)):
        for n in (i1, i2):
            dt = run(n)
            best[n] = min(best[n], dt)
            samples.append(dt / n * 1e3)
    t_iter = (best[i2] - best[i1]) / (i2 - i1)
    return max(t_iter, 1e-9) * 1e3, statistics.pstdev(samples), mem_mb


def write_results(
    records: list[BenchRecord], out_dir: str | Path, tag: str
) -> tuple[Path, Path]:
    """Timestamped JSON + CSV (reference bench_utils.py:287-325)."""
    if not records:
        raise ValueError("write_results needs at least one record")
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    jpath = out_dir / f"{tag}_{ts}.json"
    cpath = out_dir / f"{tag}_{ts}.csv"
    rows = [r.row() for r in records]
    jpath.write_text(json.dumps(rows, indent=1))
    with open(cpath, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return jpath, cpath


def console_table(records: list[BenchRecord]) -> str:
    """Fixed-width table (reference bench_utils.py:232-244)."""
    hdr = (f"{'algo':6} {'backend':8} {'dir':8} {'N':>6} {'d':>4} "
           f"{'causal':>6} {'dtype':9} {'ms':>9} {'TFLOP/s':>8} "
           f"{'%roof':>6} {'status':>7}")
    lines = [hdr, "-" * len(hdr)]
    for r in records:
        lines.append(
            f"{r.algo:6} {r.backend:8} {r.direction:8} {r.seqlen:>6} "
            f"{r.head_dim:>4} {str(r.causal):>6} {r.dtype:9} "
            f"{r.mean_ms:>9.3f} {r.tflops:>8.1f} "
            f"{100 * r.roofline_frac:>5.1f}% {r.status:>7}"
        )
    return "\n".join(lines)
