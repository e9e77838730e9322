"""Headline benchmark — prints ONE JSON line for the driver.

Metric: attention fwd+bwd TFLOP/s per chip at N=8192, d=128, bf16 on the
Pallas kernels (the BASELINE.json headline). FLOP model is the reference's
(benchmarks/bench_utils.py:210-215): fwd = 4*B*H*N^2*d, bwd = 2x fwd, so
fwd+bwd = 12*B*H*N^2*d over the combined wall time.

vs_baseline: fraction of the BASELINE.json target (85% of the v5e bf16
roofline, 197 TFLOP/s -> target 167.45).

Timing: chained dependencies + host fetch — block_until_ready does not
synchronize through the axon tunnel (see .claude/skills/verify/SKILL.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0
TARGET_FRACTION = 0.85


def _timeit_chained(fn, q, k, v, iters=10, trials=3):
    out = fn(q, k, v)
    _ = np.asarray(out[0, 0, 0, :8])  # warm + sync
    best = float("inf")
    for _ in range(trials):
        o = q
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(o, k, v)
        _ = np.asarray(o[0, 0, 0, :8])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        b, h, n, d = 1, 8, 8192, 128
    else:  # CI / no-hardware fallback: tiny shapes, still one JSON line
        b, h, n, d = 1, 2, 512, 64

    from flashattention_tpu.ops.pallas_attn import pallas_attention

    q = jax.random.normal(jax.random.key(0), (b, h, n, d), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), dtype=jnp.bfloat16)

    fwd = jax.jit(lambda q_, k_, v_: pallas_attention(q_, k_, v_)[0])

    def _loss(t):
        o, _ = pallas_attention(t[0], t[1], t[2])
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.jit(lambda q_, k_, v_: jax.grad(_loss)((q_, k_, v_))[0])

    t_fwd = _timeit_chained(fwd, q, k, v)
    t_bwd = _timeit_chained(grad, q, k, v)  # includes fwd recompute

    fwd_flops = 4 * b * h * n * n * d
    total_flops = 3 * fwd_flops           # fwd + 2x-fwd bwd (reference model)
    tflops = total_flops / (t_fwd + t_bwd) / 1e12

    target = TARGET_FRACTION * V5E_BF16_PEAK_TFLOPS
    print(json.dumps({
        "metric": "attn_fwd_bwd_tflops_per_chip_n8k_bf16",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
        "detail": {
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwd_tflops": round(fwd_flops / t_fwd / 1e12, 2),
            "bwd_ms": round(t_bwd * 1e3, 3),
            "shape": [b, h, n, d],
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
