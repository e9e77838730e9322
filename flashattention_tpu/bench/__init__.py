"""Benchmark harness: per-config timing, TFLOP/s + roofline accounting,
JSON/CSV records, figures.

Re-design of the reference's benchmarks/ (bench_utils.py, bench_fa*.py,
bench_compare_all.py, plotting.py) for TPU: same record schema and FLOP
model (4*B*H*N^2*d fwd, 2x bwd — bench_utils.py:210-215), same sweep grid
(N in 512..16K, d in {64,128,256} — bench_utils.py:250-261), plus
%-of-roofline per chip (the BASELINE.json metric the reference lacks).
"""

from flashattention_tpu.bench.harness import (
    BenchRecord,
    attention_flops,
    benchmark_call,
    peak_tflops,
    write_results,
)

__all__ = [
    "BenchRecord",
    "attention_flops",
    "benchmark_call",
    "peak_tflops",
    "write_results",
]
