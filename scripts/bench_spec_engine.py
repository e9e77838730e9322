"""Speculative decoding on the PAGED engine: tokens/s vs the plain engine.

Engine-level wall-clock (host scheduler ticks + device dispatches), the
number a serving deployment sees. Three arms, interleaved across trials in
one process (same-window discipline):

  plain        non-speculative engine, 1 dispatch / token / tick
  spec-self    draft IS the target: acceptance ~= 1, the verify-pass
               amortization ceiling (gamma+1 tokens per 2 dispatches)
  spec-draft   independent small draft (random weights -> near-zero
               acceptance): the adversarial floor

Real deployments with a distilled draft sit between spec-self and
spec-draft, much nearer spec-self (acceptance 0.6-0.9 in the literature).

    python scripts/bench_spec_engine.py [--gamma 4] [--tokens 48]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=48, help="per request")
    ap.add_argument("--batch", type=int, default=4, help="decode slots")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--draft-layers", type=int, default=2)
    ap.add_argument("--draft-d-model", type=int, default=256)
    ap.add_argument("--quant", default=None,
                    choices=[None, "int8", "fp8", "e5m2"])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir from scripts/distill_draft.py: "
                    "swaps the random-init target/draft for the TRAINED "
                    "pair (realistic acceptance) and uses in-distribution "
                    "prose prompts via the saved tokenizer")
    ap.add_argument("--out", default=None)
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
    from flashattention_tpu.serving import (
        EngineConfig,
        GenerationRequest,
        ServingEngine,
    )

    cfg = TransformerConfig(
        vocab_size=32000, d_model=args.d_model, n_layers=args.layers,
        n_heads=args.d_model // 128, d_ff=4 * args.d_model,
        max_seq_len=1024, dropout_rate=0.0, dtype=jnp.bfloat16,
    )
    dcfg = dataclasses.replace(
        cfg, n_layers=args.draft_layers, d_model=args.draft_d_model,
        n_heads=args.draft_d_model // 128, d_ff=4 * args.draft_d_model,
    )
    if args.ckpt:
        import pickle
        from pathlib import Path

        from flashattention_tpu.tokenizer import BPETokenizer

        ck = Path(args.ckpt)
        with open(ck / "target.pkl", "rb") as f:
            tgt = pickle.load(f)
        with open(ck / "draft.pkl", "rb") as f:
            drf = pickle.load(f)
        cfg = TransformerConfig(**tgt["cfg"])
        dcfg = TransformerConfig(**drf["cfg"])
        params = jax.tree_util.tree_map(jnp.asarray, tgt["params"])
        dparams = jax.tree_util.tree_map(jnp.asarray, drf["params"])
        tok = BPETokenizer.from_files(ck / "encoder.json", ck / "vocab.bpe")
        # In-distribution prompts: the draft was distilled on stdlib
        # docstring prose, so prompt with stdlib docstrings (acceptance on
        # out-of-distribution random tokens would undersell the draft).
        import json as _json
        import os as _os
        import textwrap as _tw

        texts = [m.__doc__ or "" for m in (_os, _json, _tw, time)]
        prompts = [
            list(tok.encode(" ".join((t or "module").split())[:200]))[:32]
            for t in texts
        ]
        while len(prompts) < args.batch:
            prompts.append(prompts[len(prompts) % max(len(texts), 1)])
        prompts = prompts[: args.batch]
    else:
        params = init_transformer(jax.random.key(0), cfg)
        dparams = init_transformer(jax.random.key(1), dcfg)

        rng = np.random.default_rng(0)
        prompts = [list(rng.integers(0, cfg.vocab_size, size=32))
                   for _ in range(args.batch)]

    base_kw = dict(
        max_batch_size=args.batch, page_size=64, num_pages=512,
        max_seq_len=1024, prefill_pad=32, quant=args.quant,
    )

    def build(arm):
        if arm == "plain":
            return ServingEngine(params, cfg, EngineConfig(**base_kw))
        if arm == "spec-self":
            return ServingEngine(
                params, cfg, EngineConfig(spec_gamma=args.gamma, **base_kw),
                draft_params=params, draft_cfg=cfg,
            )
        return ServingEngine(
            params, cfg, EngineConfig(spec_gamma=args.gamma, **base_kw),
            draft_params=dparams, draft_cfg=dcfg,
        )

    def run(arm):
        eng = build(arm)
        for i, p in enumerate(prompts):
            eng.submit(GenerationRequest(
                request_id=i, prompt=p, max_new_tokens=args.tokens,
            ))
        t0 = time.perf_counter()
        results = eng.run()
        dt = time.perf_counter() - t0
        n_tok = sum(len(v) for v in results.values())
        acc = None
        if getattr(eng, "spec", False) and eng.spec_proposed:
            acc = eng.spec_accepted / eng.spec_proposed
        return n_tok, dt, acc, results

    # fp32 oracle for divergence adjudication — hoisted so BOTH arms'
    # adjudicate() calls share one jit entry (one remote compile), with
    # a single fixed padded shape derived from the actual prompt lengths.
    # params is a jit ARGUMENT — closing over it embeds the weights as
    # HLO constants and blows the remote-compile body limit (HTTP 413;
    # CLAUDE.md hazard, hit in queue14).
    from flashattention_tpu.models.transformer import apply_transformer

    eval_cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    padlen = max(len(p) for p in prompts) + args.tokens

    @jax.jit
    def padded_logits(p, seq):
        return apply_transformer(p, seq, eval_cfg)

    def adjudicate(arm):
        """Token parity vs plain, with numeric-tie adjudication.

        The spec verify pass computes target logits with the chunked
        (q_len=gamma+1) kernel while the plain engine uses the q_len=1
        decode kernel; on real TPU those differ at bf16 accumulation
        class, so with random-init weights (near-flat logits) an argmax
        can legitimately flip.  CPU interpret tests pin EXACT equality
        (tests/test_serving.py spec suite); here a divergence is accepted
        only if the teacher-forced fp32 dense forward over the agreed
        prefix (padded_logits above) shows BOTH engines' choices within
        numeric-noise tolerance of the fp32 argmax.  Anything else
        (length drift, off-podium token, wide margin) stays a hard fail.
        """
        # ONE fixed padded shape for every check (a fresh length would
        # cost a fresh 30s-10min remote compile per divergence position —
        # CLAUDE.md), and a true fp32 oracle (the engines run bf16; the
        # margin being adjudicated is bf16-class, so the referee must be
        # a class tighter). Causal model: padding beyond the prefix
        # cannot affect the read position.
        details, structural = [], []
        for rid, ptoks in outs["plain"].items():
            stoks = outs[arm][rid]
            if stoks == ptoks:
                continue
            n = min(len(stoks), len(ptoks))
            i = next((j for j in range(n) if stoks[j] != ptoks[j]), n)
            if i == n:
                structural.append({"rid": rid, "kind": "length",
                                   "plain": len(ptoks), "spec": len(stoks)})
                continue
            seq = list(prompts[rid]) + list(ptoks[:i])
            read_at = len(seq) - 1
            assert len(seq) <= padlen, (len(seq), padlen)
            seq = seq + [0] * (padlen - len(seq))
            last = np.asarray(
                padded_logits(params, jnp.asarray(seq, jnp.int32)[None, :])
                [0, read_at], np.float32)
            # Numeric tie = BOTH engines' choices sit within numeric-noise
            # tolerance of the fp32 argmax. ("Both in top-2" was too
            # strict: with near-flat random-init logits MANY tokens tie
            # within bf16 noise of the max — queue16 observed a genuine
            # 5e-3-margin tie where the plain token ranked 3rd in fp32.)
            # 0.1 raw-logit units: TPU decode-vs-chunk logit deltas are
            # ~1e-2 class (CLAUDE.md); 10x headroom still rejects real
            # bugs (random-init gaps are O(1) when not tied).
            gap_p = float(last.max() - last[int(ptoks[i])])
            gap_s = float(last.max() - last[int(stoks[i])])
            rec = {"rid": rid, "pos": i,
                   "gap_plain": round(gap_p, 4), "gap_spec": round(gap_s, 4),
                   "plain_tok": int(ptoks[i]), "spec_tok": int(stoks[i])}
            if max(gap_p, gap_s) < 0.1:
                details.append(rec)
            else:
                structural.append(rec)
        return details, structural

    arms = ["plain", "spec-self", "spec-draft"]
    # Warm (compile) every arm before timing, then interleave trials.
    best = {a: float("inf") for a in arms}
    accs = {a: None for a in arms}
    outs = {}
    for a in arms:
        print(f"compiling {a} ...", flush=True)
        n_tok, dt, acc, res = run(a)
        outs[a] = res
        accs[a] = acc
    # Parity gate: every speculative arm must emit the plain engine's greedy
    # tokens, up to adjudicated numeric ties. Fail loudly on anything else.
    divergences = {}
    for a in ("spec-self", "spec-draft"):
        ties, structural = adjudicate(a)
        divergences[a] = {"numeric_ties": ties, "structural": structural}
        for rec in ties:
            print(f"{a}: numeric-tie divergence {rec}", flush=True)
        assert not structural, f"{a} diverged structurally: {structural}"
    for t in range(args.trials):
        for a in arms:
            n_tok, dt, acc, _ = run(a)
            best[a] = min(best[a], dt)
        time.sleep(1)

    total = args.batch * args.tokens
    rows = []
    for a in arms:
        rows.append({
            "arm": a,
            "wall_s": round(best[a], 3),
            "tokens_per_s": round(total / best[a], 1),
            "acceptance": None if accs[a] is None else round(accs[a], 3),
            "speedup_vs_plain": round(best["plain"] / best[a], 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "metric": "spec_engine_tokens_per_s",
        "config": {
            "gamma": args.gamma, "batch": args.batch,
            # Model dims from the configs ACTUALLY benchmarked — with
            # --ckpt these come from the checkpoint, not the CLI defaults
            # (recording args here corrupted provenance; ADVICE r5).
            "tokens_per_req": args.tokens, "layers": cfg.n_layers,
            "d_model": cfg.d_model, "draft_layers": dcfg.n_layers,
            "draft_d_model": dcfg.d_model, "quant": args.quant,
            "ckpt": args.ckpt,
        },
        "note": ("engine-level wall clock incl host ticks; spec does "
                 "2 dispatches per round of <=gamma+1 tokens vs plain's "
                 "1 per token"),
        "backend": jax.default_backend(),
        "rows": rows,
        "divergences": divergences,
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
