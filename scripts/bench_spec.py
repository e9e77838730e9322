"""Speculative-decoding latency benchmark: tokens/s vs the plain loop.

Single-sequence latency (spec decoding's target regime): a small draft
proposes gamma tokens, the target verifies them in one chunked pass. With
RANDOM weights the models disagree, so acceptance is near-zero and this
would understate the win; instead the draft IS the target (self-draft) —
acceptance ~= 1 and the measured ceiling is the genuine verify-pass
amortization (one target pass per ~gamma+1 tokens). The realistic range
lives between the two endpoints; both are reported.

Host-driven loops: each emitted token round-trips the tunnel either way,
so the dispatch overhead rides both sides roughly equally (spec decode
does FEWER dispatches per token — part of its real win here).

    python scripts/bench_spec.py [--gamma 4] [--tokens 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--draft-layers", type=int, default=2)
    ap.add_argument("--draft-d-model", type=int, default=256)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/results/spec_r02.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from flashattention_tpu.utils.profiling import enable_compile_cache

        enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from flashattention_tpu.models.transformer import (
        TransformerConfig,
        init_transformer,
    )
    from flashattention_tpu.serving.speculative import (
        generate,
        speculative_generate,
    )

    def mkcfg(layers, d_model):
        return TransformerConfig(
            vocab_size=8192, d_model=d_model, n_layers=layers,
            n_heads=max(4, d_model // 128), d_ff=4 * d_model,
            max_seq_len=args.tokens + 64, block_size=64,
            dropout_rate=0.0, dtype=jnp.bfloat16,
        )

    cfg_t = mkcfg(args.layers, args.d_model)
    cfg_d = mkcfg(args.draft_layers, args.draft_d_model)
    params_t = init_transformer(jax.random.key(0), cfg_t)
    params_d = init_transformer(jax.random.key(1), cfg_d)
    prompt = list(np.random.default_rng(0).integers(0, cfg_t.vocab_size, 16))

    def timed(fn):
        best = float("inf")
        fn()  # compile
        for _ in range(args.trials):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain = timed(lambda: generate(
        params_t, cfg_t, prompt, max_new_tokens=args.tokens))

    stats = {}

    def run_spec(draft_params, draft_cfg, tag):
        def go():
            toks, st = speculative_generate(
                params_t, draft_params, cfg_t, draft_cfg, prompt,
                max_new_tokens=args.tokens, gamma=args.gamma,
            )
            stats[tag] = st
            return toks
        return timed(go)

    t_self = run_spec(params_t, cfg_t, "self")          # acceptance ~ 1
    t_draft = run_spec(params_d, cfg_d, "draft")        # random: ~ 0

    rec = {
        "metric": "spec_decode_speedup_self_draft",
        "value": round(t_plain / t_self, 2),
        "unit": "x vs plain decode (acceptance ceiling)",
        "detail": {
            "plain_s": round(t_plain, 3),
            "self_draft_s": round(t_self, 3),
            "random_draft_s": round(t_draft, 3),
            "gamma": args.gamma,
            "tokens": args.tokens,
            "self_acceptance": round(stats["self"].acceptance_rate, 3),
            "random_acceptance": round(stats["draft"].acceptance_rate, 3),
            "self_tokens_per_target_pass": round(
                stats["self"].tokens_per_target_pass, 2),
            "target": {"layers": args.layers, "d_model": args.d_model},
            "draft": {"layers": args.draft_layers,
                      "d_model": args.draft_d_model},
            "backend": jax.default_backend(),
        },
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
