"""IN-PROCESS same-window A/B of trace-time variants (env flags / kwargs).

Why this exists: the subprocess A/B (scripts/ab_compare.py) alternates whole
child processes, and queue9's lagged-max run showed a SYSTEMATIC per-process
SOL split (arm A 184.6 TF, arm B 147.0 TF in BOTH pairs) that swallowed the
~14% effect under test — process identity correlated with the chip's
contention phase (VERDICT r3 weak #2). Here both variants are traced in ONE
process (FAT_* env knobs are read at TRACE time, so flipping os.environ
between `jit` traces yields two co-resident compiled programs) and their
timing loops interleave at the TRIAL level: A(i1) B(i1) A(i2) B(i2) per
trial, with a matmul speed-of-light probe before and after each pair.
Contention phases hit both arms equally by construction.

Usage:
  python scripts/ab_inproc.py --env-b FAT_FWD_LAGGED_MAX=1 --what fwd
  python scripts/ab_inproc.py --kw-b softcap=30.0 --what fwd   # softcap cost
  python scripts/ab_inproc.py --kw-b window=1024 --causal --what fwd
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_env(s):
    return dict(kv.split("=", 1) for kv in s.split(",")) if s else {}


def parse_kw(s):
    out = {}
    if not s:
        return out
    for kv in s.split(","):
        k, v = kv.split("=", 1)
        try:
            out[k] = float(v) if "." in v else int(v)
        except ValueError:
            out[k] = v  # string kwargs (e.g. mode=fused_cached)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="1,8,8192,128")
    ap.add_argument("--what", default="fwd",
                    choices=["fwd", "bwd", "fp8feat", "fp8fwd", "fp8bwd"])
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--env-a", default=None)
    ap.add_argument("--env-b", default=None)
    ap.add_argument("--kw-a", default=None)
    ap.add_argument("--kw-b", default=None)
    ap.add_argument("--blocks", default=None)
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    args = ap.parse_args()
    b, h, n, d = (int(x) for x in args.shape.split(","))

    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from flashattention_tpu.ops.pallas_attn import pallas_attention

    if args.blocks:
        parts = [int(x) for x in args.blocks.split(",")]
        bq, bk = parts[0], parts[1]
        bwd_bq = parts[2] if len(parts) > 2 else None
        bwd_bk = parts[3] if len(parts) > 3 else None
    else:
        from flashattention_tpu.ops.specs import pick_fa2_spec

        spec = pick_fa2_spec(d, n)
        bq, bk = spec.block_q, spec.block_k
        bwd_bq, bwd_bk = spec.bwd_block_q, spec.bwd_block_k

    n_q = 128 if args.what == "fp8feat" else n
    q = jax.random.normal(jax.random.key(0), (b, h, n_q, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)

    def make_loop(extra_kw):
        """A fresh jitted fori_loop closure (distinct identity => distinct
        jit cache) calling pallas_attention with the variant's kwargs."""
        if args.what == "fp8feat":
            # fp8 fused-with-features vs forced predecode at a bandwidth-
            # bound shape (short q, long KV, window + softcap). Arm A =
            # predecode (what pre-round-4 dispatch forced for featured
            # calls, paying full bf16 HBM traffic), arm B = fused.
            # --label-a/--label-b must match this fixed assignment.
            from flashattention_tpu.ops.pallas_fp8 import (
                pallas_fp8_attention,
            )

            mode = extra_kw.get("mode", "fused")

            @jax.jit
            def loop(n_, q_, k_, v_):
                def body(i, acc):
                    o, _ = pallas_fp8_attention(
                        acc, k_, v_, causal=True, window=4096, softcap=30.0,
                        mode=mode, block_q=bq, block_k=bk,
                    )
                    return o.astype(q_.dtype)
                return lax.fori_loop(0, n_, body, q_)
            return loop
        if args.what in ("fp8fwd", "fp8bwd"):
            # Full-shape fp8 A/B (e.g. mode=fused_cached vs predecode, or
            # fmt=int8 vs fp8) at the headline geometry.
            from flashattention_tpu.ops.pallas_fp8 import (
                pallas_fp8_attention,
            )

            fkw = dict(causal=args.causal, block_q=bq, block_k=bk,
                       **extra_kw)
            if args.what == "fp8fwd":
                @jax.jit
                def loop(n_, q_, k_, v_):
                    def body(i, acc):
                        o, _ = pallas_fp8_attention(acc, k_, v_, **fkw)
                        return o.astype(q_.dtype)
                    return lax.fori_loop(0, n_, body, q_)
            else:
                def floss(t):
                    o, _ = pallas_fp8_attention(t[0], t[1], t[2], **fkw)
                    return jnp.sum(o.astype(jnp.float32) ** 2)

                @jax.jit
                def loop(n_, q_, k_, v_):
                    def body(i, acc):
                        dq, dk, dv = jax.grad(floss)((acc, k_, v_))
                        return (dq + dk + dv).astype(q_.dtype)
                    return lax.fori_loop(0, n_, body, q_)
            return loop
        kw = dict(causal=args.causal, block_q=bq, block_k=bk,
                  bwd_block_q=bwd_bq, bwd_block_k=bwd_bk, **extra_kw)
        if args.what == "fwd":
            @jax.jit
            def loop(n_, q_, k_, v_):
                def body(i, acc):
                    return pallas_attention(acc, k_, v_, **kw)[0].astype(
                        q_.dtype)
                return lax.fori_loop(0, n_, body, q_)
        else:
            def loss(t):
                o, _ = pallas_attention(t[0], t[1], t[2], **kw)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            @jax.jit
            def loop(n_, q_, k_, v_):
                def body(i, acc):
                    dq, dk, dv = jax.grad(loss)((acc, k_, v_))
                    return (dq + dk + dv).astype(q_.dtype)  # ALL grads
                return lax.fori_loop(0, n_, body, q_)
        return loop

    def traced(env, kw):
        """Trace the variant's loop with its env set (FAT_* knobs are read
        at trace time), then restore the environment."""
        saved = {kk: os.environ.get(kk) for kk in env}
        os.environ.update(env)
        try:
            loop = make_loop(kw)
            out = loop(jnp.int32(2), q, k, v)  # compile now, env active
            _ = np.asarray(out).ravel()[:8]
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv
        return loop

    env_a, env_b = parse_env(args.env_a), parse_env(args.env_b)
    kw_a, kw_b = parse_kw(args.kw_a), parse_kw(args.kw_b)
    if args.what == "fp8feat":
        kw_a.setdefault("mode", "predecode")
        kw_b.setdefault("mode", "fused")
    print(f"A = env {env_a} kw {kw_a}\nB = env {env_b} kw {kw_b}", flush=True)
    loop_a = traced(env_a, kw_a)
    loop_b = traced(env_b, kw_b)

    # SOL probe (pre-traced so probes cost no compiles mid-window).
    m = 6144
    a0 = jax.random.normal(jax.random.key(7), (m, m), jnp.bfloat16)
    b0 = jax.random.normal(jax.random.key(8), (m, m), jnp.bfloat16)

    @jax.jit
    def mm_loop(n_, x, y):
        def body(i, acc):
            return jnp.dot(
                acc, y, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        return lax.fori_loop(0, n_, body, x)

    def timed(loop, iters, *a):
        t0 = time.perf_counter()
        out = loop(jnp.int32(iters), *a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]
        return time.perf_counter() - t0

    timed(mm_loop, 2, a0, b0)  # compile

    def sol():
        t1 = timed(mm_loop, 30, a0, b0)
        t2 = timed(mm_loop, 510, a0, b0)
        return round(2 * m ** 3 * 480 / (t2 - t1) / 1e12, 1)

    scale = max(1, 8192 // n)
    if args.what in ("fwd", "fp8fwd"):
        i1, i2 = 30, 30 + 300 * scale
    elif args.what == "fp8feat":
        i1, i2 = 30, 330
    else:
        i1, i2 = 10, 10 + 100 * scale
    if args.what == "fp8feat":
        flops = 4 * b * h * n_q * min(4096, n) * d  # windowed band
    else:
        flops = 4 * b * h * n * n * d / (2 if args.causal else 1)
    if args.what in ("bwd", "fp8bwd"):
        flops *= 3

    ratios = []
    rows = []
    for p in range(args.pairs):
        s_pre = sol()
        # Interleave at the (arm, length) level within the pair.
        ta = {i1: float("inf"), i2: float("inf")}
        tb = {i1: float("inf"), i2: float("inf")}
        for _trial in range(3):
            for it in (i1, i2):
                ta[it] = min(ta[it], timed(loop_a, it, q, k, v))
                tb[it] = min(tb[it], timed(loop_b, it, q, k, v))
        s_post = sol()
        a_ms = (ta[i2] - ta[i1]) / (i2 - i1) * 1e3
        b_ms = (tb[i2] - tb[i1]) / (i2 - i1) * 1e3
        r = b_ms / a_ms
        ratios.append(r)
        rows.append({
            "pair": p, "a_ms": round(a_ms, 4), "b_ms": round(b_ms, 4),
            "b_over_a": round(r, 4),
            "a_tflops": round(flops / (a_ms / 1e3) / 1e12, 1),
            "b_tflops": round(flops / (b_ms / 1e3) / 1e12, 1),
            "sol_pre": s_pre, "sol_post": s_post,
        })
        print(json.dumps(rows[-1]), flush=True)
        time.sleep(2)

    med = statistics.median(ratios)
    verdict = ("A faster" if med > 1.02 else
               "B faster" if med < 0.98 else "within noise")
    print(json.dumps({
        "metric": f"ab_inproc_{args.what}",
        "label_a": args.label_a, "label_b": args.label_b,
        "env_a": env_a, "env_b": env_b, "kw_a": kw_a, "kw_b": kw_b,
        "shape": [b, h, n, d], "causal": args.causal,
        "median_b_over_a": round(med, 4), "verdict": verdict,
        "pairs": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
