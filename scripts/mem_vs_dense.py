"""Flash-vs-dense peak-memory demonstration — the reference's fig-3 story
(README.md:70 "memory scales linearly", bench_utils.py:126-142 records
per-iter peak memory) with exact numbers from XLA's buffer assignment.

Through the axon tunnel, runtime ``memory_stats()`` returns nothing, so the
reference's ``max_memory_allocated`` approach is unavailable. Instead each
config's fwd+bwd program is lowered+compiled and its
``memory_analysis().peak_memory_in_bytes`` recorded — the compiler's exact
peak over the program's buffer assignment (arguments + outputs + temps),
i.e. what the runtime WOULD allocate. Dense configs whose score tensors
exceed HBM fail buffer assignment / compile with RESOURCE_EXHAUSTED; those
rows are recorded as compile-OOM — itself the demonstration that O(N^2)
attention stops fitting where flash keeps going.

Writes benchmarks/results/memory_r03.json; safe to run on CPU (the
analysis is backend-generic) but the committed artifact should be TPU.

    python scripts/mem_vs_dense.py [--out benchmarks/results/memory_r03.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_mb(fn, *args):
    import jax
    import jax.numpy as jnp

    try:
        ma = jax.jit(fn).lower(*args).compile().memory_analysis()
        if ma is None:
            return None, "no-analysis"
        return float(ma.peak_memory_in_bytes) / 1e6, "ok"
    except Exception as e:
        kind = "compile-oom" if "RESOURCE_EXHAUSTED" in str(e) else "failed"
        return None, f"{kind}: {type(e).__name__}: {e}"[:160]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/memory_r03.json")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--seqlens", type=int, nargs="+",
                    default=[2048, 4096, 8192, 16384, 32768])
    args = ap.parse_args()

    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from flashattention_tpu.ops.pallas_attn import pallas_attention
    from flashattention_tpu.ops.reference import reference_attention

    b, h, d = args.batch, args.heads, args.dim
    rows = []
    for n in args.seqlens:
        q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)

        def flash_grad(t):
            def loss(t_):
                o, _ = pallas_attention(t_[0], t_[1], t_[2], causal=True)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            dq, dk, dv = jax.grad(loss)(t)
            return dq + dk + dv

        def dense_grad(t):
            def loss(t_):
                o, _ = reference_attention(t_[0], t_[1], t_[2], causal=True)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            dq, dk, dv = jax.grad(loss)(t)
            return dq + dk + dv

        io_mb = 3 * q.size * 2 / 1e6  # q/k/v bf16 arguments
        flash_mb, flash_status = peak_mb(flash_grad, (q, k, v))
        dense_mb, dense_status = peak_mb(dense_grad, (q, k, v))
        # Analytical expectations: flash residuals are O(N) (o, lse, inputs);
        # dense materializes the (B, H, N, N) fp32 score/softmax planes.
        dense_scores_mb = b * h * n * n * 4 / 1e6
        row = {
            "seqlen": n, "batch": b, "heads": h, "head_dim": d,
            "qkv_args_mb": round(io_mb, 1),
            "flash_peak_mb": round(flash_mb, 1) if flash_mb else None,
            "flash_status": flash_status,
            "dense_peak_mb": round(dense_mb, 1) if dense_mb else None,
            "dense_status": dense_status,
            "dense_score_plane_mb_analytical": round(dense_scores_mb, 1),
            "mem_source": "xla_compiled_memory_analysis",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "metric": "flash_vs_dense_peak_memory",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "note": ("flash fwd+bwd peak grows O(N) (inputs + O(N) residuals); "
                 "dense grows O(N^2) and compile-OOMs where the score "
                 "planes exceed HBM — reference README.md:70 fig-3 claim, "
                 "measured via XLA buffer assignment"),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
