"""Headline benchmark — prints ONE JSON line for the driver.

Metric: attention fwd+bwd TFLOP/s per chip at N=8192, d=128, bf16 on the
Pallas kernels (the BASELINE.json headline). FLOP model is the reference's
(benchmarks/bench_utils.py:210-215): fwd = 4*B*H*N^2*d, bwd = 2x fwd, so
fwd+bwd = 12*B*H*N^2*d over the combined wall time.

Timing methodology (see .claude/skills/verify/SKILL.md and memory note
tpu-bench-contention): the TPU is behind the host-mediated axon tunnel where
(a) block_until_ready does not synchronize and (b) every dispatch costs
~30 ms. So each measurement runs ITERS chained iterations *on device* inside
one jitted lax.fori_loop (single dispatch, dependencies serialize the
iterations) and fetches 8 elements at the end to synchronize.
"""

import json
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

V5E_BF16_PEAK_TFLOPS = 197.0
TARGET_FRACTION = 0.85


def _timeit_loop(fn_one, args, *, iters, trials=6, spacing_s=4.0):
    """Best per-iteration time of ITERS on-device chained calls.

    The shared chip + tunnel go through multi-second contention phases, so
    trials are spaced out and the minimum taken — during a healthy window the
    per-dispatch constant is amortized to <1 ms/iter by the long loop.
    """

    @jax.jit
    def loop(a0, *rest):
        def body(i, o):
            return fn_one(o, *rest)
        return lax.fori_loop(0, iters, body, a0)

    out = loop(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]  # warm+sync
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        out = loop(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]
        best = min(best, (time.perf_counter() - t0) / iters)
        if t + 1 < trials:
            time.sleep(spacing_s)
    return best


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        b, h, n, d = 1, 8, 8192, 128
        iters = 120  # long loops amortize the tunnel's per-dispatch buffer
        # re-upload (measured: totals are ~constant below ~80 iters)
    else:  # CI / no-hardware fallback: tiny shapes, still one JSON line
        b, h, n, d = 1, 2, 512, 64
        iters = 2

    def measure_matmul_sol():
        """Empirical roofline: a plain matmul under the same timing. Small
        (2048^2) buffers — big buffers get evicted between the shared chip's
        time slices and measure re-upload, not compute."""
        m = 2048 if on_tpu else 256
        a0 = jax.random.normal(jax.random.key(7), (m, m), dtype=jnp.bfloat16)
        b0 = jax.random.normal(jax.random.key(8), (m, m), dtype=jnp.bfloat16)
        t_mm = _timeit_loop(
            lambda x, y: jnp.dot(
                x, y, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16),
            (a0, b0), iters=min(400, iters * 4), trials=3, spacing_s=2.0,
        )
        return 2 * m**3 / t_mm / 1e12

    from flashattention_tpu.ops.pallas_attn import pallas_attention

    q = jax.random.normal(jax.random.key(0), (b, h, n, d), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), dtype=jnp.bfloat16)

    def fwd_one(q_, k_, v_):
        return pallas_attention(q_, k_, v_)[0].astype(q_.dtype)

    def _loss(t):
        o, _ = pallas_attention(t[0], t[1], t[2])
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def grad_one(q_, k_, v_):
        return jax.grad(_loss)((q_, k_, v_))[0].astype(q_.dtype)

    # The shared chip goes through multi-minute contention phases (a plain
    # matmul has measured anywhere from 12 to 109 TFLOP/s across an hour).
    # Take up to 4 measurement rounds, spaced out, and keep the best —
    # "best observed" is the honest kernel number; contended numbers measure
    # the neighbor's workload, not this code.
    fwd_flops = 4 * b * h * n * n * d
    total_flops = 3 * fwd_flops           # fwd + 2x-fwd bwd (reference model)
    best = None

    def emit(result):
        tflops, t_fwd, t_bwd, mm_tflops = result
        target_ = TARGET_FRACTION * V5E_BF16_PEAK_TFLOPS
        print(json.dumps({
            "metric": "attn_fwd_bwd_tflops_per_chip_n8k_bf16",
            "value": round(tflops, 2),
            "unit": "TFLOP/s",
            "vs_baseline": round(tflops / target_, 4),
            "detail": {
                "fwd_ms": round(t_fwd * 1e3, 3),
                "fwd_tflops": round(fwd_flops / t_fwd / 1e12, 2),
                "bwd_ms": round(t_bwd * 1e3, 3),
                "bwd_tflops": round(3 * fwd_flops / t_bwd / 1e12, 2),
                "shape": [b, h, n, d],
                "iters": iters,
                "matmul_sol_tflops": round(mm_tflops, 2),
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            },
        }), flush=True)

    def on_term(signum, frame):
        # Killed by a driver timeout mid-measurement (the shared chip can
        # stall for minutes): print the best completed round, if any, so the
        # run still produces its one JSON line.
        if best is not None:
            emit(best)
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_term)
    rounds = 3 if on_tpu else 1
    t_start = time.perf_counter()
    for attempt in range(rounds):
        # Always leave time to print: stop starting new rounds after 5 min.
        if attempt and time.perf_counter() - t_start > 300:
            break
        # Attention first: healthy windows last minutes; don't spend the
        # window's start on the roofline probe.
        t_fwd = _timeit_loop(fwd_one, (q, k, v), iters=iters, trials=3)
        t_bwd = _timeit_loop(grad_one, (q, k, v), iters=max(iters // 3, 2),
                             trials=3)
        mm_tflops = measure_matmul_sol()
        tflops = total_flops / (t_fwd + t_bwd) / 1e12
        if best is None or tflops > best[0]:
            best = (tflops, t_fwd, t_bwd, mm_tflops)
        # Healthy chip: matmul near its known-good rate -> trust this round.
        if not on_tpu or mm_tflops > 60.0:
            break
        if attempt + 1 < rounds:
            time.sleep(30)
    emit(best)


if __name__ == "__main__":
    main()
