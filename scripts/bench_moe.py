"""MoE train-step throughput vs matched-FLOPs dense (TPU, tunnel-safe).

A top-k=2 mixture with per-expert hidden F costs the same MLP FLOPs per
token as a dense MLP with hidden 2F (each token visits 2 experts), so

    overhead = t_step(moe E, k=2, F) / t_step(dense 2F)

isolates what the GShard one-hot dispatch/combine einsums + router cost
on top of the expert matmuls. Also reports a dense-F arm (the "same
params per expert" view) and the aux loss value.

Timing: two-point method (CLAUDE.md) — one jitted lax.fori_loop with a
traced trip count, two lengths, min over trials, t_iter from the
difference; all arms interleaved in one process.

    python scripts/bench_moe.py [--out FILE]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-ff", type=int, default=2048)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--i1", type=int, default=4)
    ap.add_argument("--i2", type=int, default=16)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args()

    import jax

    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from flashattention_tpu.utils.profiling import enable_compile_cache

        enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from flashattention_tpu.models.train import (
        TrainConfig,
        loss_fn,
        make_optimizer,
    )
    from flashattention_tpu.models.transformer import (
        TransformerConfig,
        init_transformer,
    )

    base = TransformerConfig(
        vocab_size=32000, d_model=ns.d_model, n_layers=ns.layers,
        n_heads=ns.d_model // 128, d_ff=ns.d_ff, max_seq_len=ns.seq,
        dropout_rate=0.0, dtype=jnp.bfloat16, remat=False,
    )
    cfgs = {
        "dense-F": base,
        "dense-2F": dataclasses.replace(base, d_ff=2 * ns.d_ff),
        f"moe-E{ns.experts}k2": dataclasses.replace(
            base, moe_experts=ns.experts, moe_top_k=2
        ),
    }
    tc = TrainConfig(grad_accum=1, warmup_steps=2, total_steps=1000,
                     batch_size=ns.batch, seq_len=ns.seq)
    tx = make_optimizer(tc)
    tokens = jax.random.randint(
        jax.random.key(1), (ns.batch, ns.seq + 1), 0, base.vocab_size
    )

    def build(name, cfg):
        import optax

        params = init_transformer(jax.random.key(0), cfg)
        opt = jax.jit(tx.init)(params)

        @jax.jit
        def loop(n_, p, o):
            def body(i, c):
                p, o = c
                k = jax.random.fold_in(jax.random.key(2), i)
                _, grads = jax.value_and_grad(loss_fn)(
                    p, {"tokens": tokens}, cfg, k
                )
                up, o = tx.update(grads, o, p)
                return optax.apply_updates(p, up), o
            p, o = jax.lax.fori_loop(0, n_, body, (p, o))
            return jax.tree.leaves(p)[0]

        @jax.jit
        def one_loss(p):
            return loss_fn(p, {"tokens": tokens}, cfg, jax.random.key(2))

        return params, opt, loop, one_loss

    arms = {n: build(n, c) for n, c in cfgs.items()}
    nparams = {
        n: sum(x.size for x in jax.tree.leaves(a[0])) / 1e6
        for n, a in arms.items()
    }

    # warm compile
    for n, (p, o, loop, one_loss) in arms.items():
        print(f"compiling {n} ...", flush=True)
        lf = loop(jnp.int32(1), p, o)
        _ = np.asarray(lf).ravel()[:2]
        print(f"  loss={float(one_loss(p)):.3f}", flush=True)

    best = {n: {ns.i1: 1e9, ns.i2: 1e9} for n in arms}
    for t in range(ns.trials):
        for it in (ns.i1, ns.i2):
            for n, (p, o, loop, _) in arms.items():
                t0 = time.perf_counter()
                lf = loop(jnp.int32(it), p, o)
                _ = np.asarray(lf).ravel()[:2]
                best[n][it] = min(best[n][it], time.perf_counter() - t0)
        time.sleep(1)

    toks = ns.batch * ns.seq
    rows = {}
    for n in arms:
        step_s = (best[n][ns.i2] - best[n][ns.i1]) / (ns.i2 - ns.i1)
        rows[n] = {
            "step_ms": round(step_s * 1e3, 3),
            "tokens_per_s": round(toks / step_s, 1),
            "params_m": round(nparams[n], 1),
        }
        print(json.dumps({n: rows[n]}), flush=True)

    moe_key = f"moe-E{ns.experts}k2"
    out = {
        "metric": "moe_train_step_overhead",
        "value": round(rows[moe_key]["step_ms"] / rows["dense-2F"]["step_ms"],
                       3),
        "unit": "x matched-FLOPs dense step time",
        "detail": {
            "rows": rows, "batch": ns.batch, "seq": ns.seq,
            "d_model": ns.d_model, "layers": ns.layers, "d_ff": ns.d_ff,
            "experts": ns.experts,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out), flush=True)
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
