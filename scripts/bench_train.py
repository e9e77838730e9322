"""End-to-end train-step throughput + MFU on the flagship LM config.

Measures the full training step (fwd + bwd + AdamW update) on one chip at
the reference's intended training config (GPT-3-small-ish: d_model 768,
12L/12H — flashattention_pytorch.py:706-711; README.md:130-135 "A100 Colab,
AMP, grad-accum" — the reference never published a number for it).

Honest tunnel timing (CLAUDE.md): ONE jitted lax.fori_loop with a TRACED
trip count carrying (params, opt_state), two lengths interleaved, min over
trials, t_step from the difference. The batch is a fixed jit ARGUMENT (a
closed-over array would embed in the HLO and blow the remote-compile size
cap). MFU counts 6*P*tokens for the matmul parameters + the exact
attention FLOPs (fwd 4BHN^2d * 0.5 causal, bwd 2x), over the v5e's 197
TFLOP/s bf16 nameplate.

Writes benchmarks/results/train_r0N.json and prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (sitecustomize pins axon; env vars "
                         "alone cannot override — jax.config can)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=50257)
    ap.add_argument("--loss-chunk", type=int, default=512,
                    help="chunked-CE logits window (0 = dense logits)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--iters", default="3,13", help="i1,i2 two-point counts")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-block jax.checkpoint (the activations "
                         "fit HBM at the flagship config; removes the "
                         "~+2P/token forward recompute)")
    ap.add_argument("--remat-policy", default="full", choices=["full", "dots"])
    ap.add_argument("--attrib", action="store_true",
                    help="also time fwd-only and grad-only loops in the "
                         "same window (MFU attribution: fwd/bwd/optimizer "
                         "split — VERDICT r2 item 7)")
    ap.add_argument("--out", default="benchmarks/results/train_r03.json")
    args = ap.parse_args()
    i1, i2 = (int(x) for x in args.iters.split(","))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from flashattention_tpu.utils.profiling import enable_compile_cache

        enable_compile_cache()

    global jnp, np, optax, lax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    global TrainConfig, loss_fn, make_optimizer
    global TransformerConfig, init_transformer
    from flashattention_tpu.models.train import (
        TrainConfig, loss_fn, make_optimizer,
    )
    from flashattention_tpu.models.transformer import (
        TransformerConfig, init_transformer,
    )

    cfg = TransformerConfig(
        vocab_size=args.vocab,
        d_model=args.d_model,
        n_layers=args.layers,
        n_heads=args.heads,
        d_ff=4 * args.d_model,
        max_seq_len=args.seq,
        block_size=512,
        dropout_rate=0.0,
        remat=not args.no_remat,
        remat_policy=args.remat_policy,
        loss_chunk=args.loss_chunk or None,
    )
    tc = TrainConfig(grad_accum=1, batch_size=args.batch, seq_len=args.seq)
    tx = make_optimizer(tc)

    params = init_transformer(jax.random.key(0), cfg)
    opt_state = tx.init(params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    tokens = jax.random.randint(
        jax.random.key(1), (args.batch, args.seq + 1), 0, cfg.vocab_size
    )

    def one_step(carry, batch_tokens):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(
            p, {"tokens": batch_tokens}, cfg, None
        )
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    @jax.jit
    def loop(n_, p, s, batch_tokens):
        def body(i, carry):
            return one_step(carry, batch_tokens)[0]
        return lax.fori_loop(0, n_, body, (p, s))

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    out = loop(jnp.int32(1), params, opt_state, tokens)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
    print(f"compile+1step {time.perf_counter() - t0:.1f}s", flush=True)

    best = {i1: float("inf"), i2: float("inf")}
    for _ in range(args.trials):
        for it in (i1, i2):
            t0 = time.perf_counter()
            out = loop(jnp.int32(it), params, opt_state, tokens)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
            best[it] = min(best[it], time.perf_counter() - t0)
    t_step = (best[i2] - best[i1]) / (i2 - i1)

    def two_point_loop(lp, largs):
        """Same two-point protocol for the attribution sub-loops."""
        b2 = {i1: float("inf"), i2: float("inf")}
        out0 = lp(jnp.int32(1), *largs)
        _ = np.asarray(jax.tree_util.tree_leaves(out0)[0]).ravel()[:4]
        for _ in range(args.trials):
            for it in (i1, i2):
                t0 = time.perf_counter()
                o = lp(jnp.int32(it), *largs)
                _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:4]
                b2[it] = min(b2[it], time.perf_counter() - t0)
        return (b2[i2] - b2[i1]) / (i2 - i1)

    attrib = None
    if args.attrib:
        # Same-window decomposition: fwd-only (loss value), fwd+bwd (grads,
        # no optimizer). optimizer cost ~= full - grad; bwd ~= grad - fwd.
        # Each loop chains through a param-scaled carry so nothing is DCE'd
        # or hoisted.
        @jax.jit
        def fwd_loop(n_, p, batch_tokens):
            def body(i, acc):
                return acc + loss_fn(p, {"tokens": batch_tokens}, cfg, None)
            return lax.fori_loop(0, n_, body, jnp.float32(0.0))

        @jax.jit
        def grad_loop(n_, p, batch_tokens):
            def body(i, pp):
                _, g = jax.value_and_grad(loss_fn)(
                    pp, {"tokens": batch_tokens}, cfg, None
                )
                # 1e-30*g is numerically nothing but NOT foldable — keeps
                # every grad leaf live (DCE hazard, CLAUDE.md).
                return jax.tree_util.tree_map(
                    lambda x, gg: x + (1e-30 * gg).astype(x.dtype), pp, g
                )
            return lax.fori_loop(0, n_, body, p)

        t_fwd = two_point_loop(fwd_loop, (params, tokens))
        t_grad = two_point_loop(grad_loop, (params, tokens))
        attrib = {
            "fwd_ms": round(t_fwd * 1e3, 2),
            "fwd_bwd_ms": round(t_grad * 1e3, 2),
            "bwd_only_ms": round((t_grad - t_fwd) * 1e3, 2),
            "optimizer_ms_est": round((t_step - t_grad) * 1e3, 2),
            "note": "same-window two-point loops; bwd=grad-fwd, opt=step-grad",
        }

    toks = args.batch * args.seq
    b, h, n, d = args.batch, args.heads, args.seq, cfg.d_head
    attn_flops = 3 * (4 * b * h * n * n * d / 2) * args.layers  # fwd+2x bwd
    flops = 6 * n_params * toks + attn_flops
    mfu = flops / t_step / V5E_PEAK
    # Remat accounting: full-policy jax.checkpoint recomputes each block's
    # forward during backward — ~+2P/token matmul FLOPs the 6P model never
    # credits, capping credited MFU at ~6/8 = 0.75 of realized utilization.
    realized = flops
    if not args.no_remat and args.remat_policy == "full":
        realized = flops + 2 * n_params * toks + attn_flops / 3
    mfu_realized = realized / t_step / V5E_PEAK
    rec = {
        "metric": "train_step_tokens_per_s",
        "value": round(toks / t_step, 1),
        "unit": "tokens/s/chip",
        "detail": {
            "step_ms": round(t_step * 1e3, 2),
            "mfu_vs_197tf": round(mfu, 4),
            "flops_per_step": flops,
            "n_params": n_params,
            "batch": args.batch,
            "seq": args.seq,
            "layers": args.layers,
            "d_model": args.d_model,
            "heads": args.heads,
            "vocab": args.vocab,
            "remat": not args.no_remat,
            "remat_policy": args.remat_policy if not args.no_remat else None,
            "mfu_realized_incl_recompute": round(mfu_realized, 4),
            "attrib": attrib,
            "loss_chunk": args.loss_chunk or None,
            "optimizer": "adamw+clip+warmup-cosine",
            "backend": jax.default_backend(),
            "method": "two_point_fori_loop",
            "iters": [i1, i2],
            "trials": args.trials,
        },
    }
    line = json.dumps(rec)
    print(line, flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
