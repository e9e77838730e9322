"""Timing child for same-window A/B runs (scripts/ab_compare.py).

Measures the Pallas attention forward and/or fwd+bwd call at one shape with
the honest two-point method (bench.py docstring: traced-length fori_loop,
interleaved lengths, min over trials, all grads consumed) plus the window's
matmul speed-of-light, and prints ONE JSON line.

Which `flashattention_tpu` it times is chosen by the PARENT via PYTHONPATH —
this file deliberately does NOT pin sys.path, so the A/B runner can point
identical children at the working tree and at a git-worktree of any rev.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="1,8,8192,128", help="B,H,N,D")
    ap.add_argument("--what", default="fwd,bwd,sol",
                    help="comma-set of fwd,bwd,fp8,sol")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--blocks", default=None,
                    help="bq,bk[,bwd_bq,bwd_bk] (default: spec table)")
    args = ap.parse_args()
    b, h, n, d = (int(x) for x in args.shape.split(","))
    what = set(args.what.split(","))

    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import flashattention_tpu
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

    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)

    def attn(q_, k_, v_):
        return pallas_attention(
            q_, k_, v_, causal=args.causal, block_q=bq, block_k=bk,
            bwd_block_q=bwd_bq, bwd_block_k=bwd_bk,
        )

    def two_point(fn_one, a0, rest, i1, i2):
        @jax.jit
        def loop(n_, x, *r):
            def body(i, acc):
                return fn_one(acc, *r)
            return lax.fori_loop(0, n_, body, x)

        out = loop(jnp.int32(2), a0, *rest)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]
        best = {i1: float("inf"), i2: float("inf")}
        for _ in range(args.trials):
            for iters in (i1, i2):
                t0 = time.perf_counter()
                out = loop(jnp.int32(iters), a0, *rest)
                _ = np.asarray(
                    jax.tree_util.tree_leaves(out)[0]
                ).ravel()[:8]
                best[iters] = min(best[iters], time.perf_counter() - t0)
        return (best[i2] - best[i1]) / (i2 - i1)

    fwd_flops = 4 * b * h * n * n * d / (2 if args.causal else 1)
    scale = max(1, 8192 // n)
    out = {"repo": os.path.dirname(os.path.dirname(
        os.path.abspath(flashattention_tpu.__file__))),
        "shape": [b, h, n, d], "blocks": [bq, bk, bwd_bq, bwd_bk],
        "causal": args.causal,
        "env": {k_: v_ for k_, v_ in os.environ.items()
                if k_.startswith("FAT_")}}

    if "fwd" in what:
        def fwd_one(q_, k_, v_):
            return attn(q_, k_, v_)[0].astype(q_.dtype)
        t = two_point(fwd_one, q, (k, v), 30, 30 + 300 * scale)
        out["fwd_ms"] = round(t * 1e3, 4)
        out["fwd_tflops"] = round(fwd_flops / t / 1e12, 2)

    if "bwd" in what:
        def loss(t_):
            o, _ = attn(t_[0], t_[1], t_[2])
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def grad_one(q_, k_, v_):
            dq, dk, dv = jax.grad(loss)((q_, k_, v_))
            return (dq + dk + dv).astype(q_.dtype)  # ALL grads (DCE hazard)
        t = two_point(grad_one, q, (k, v), 10, 10 + 100 * scale)
        out["bwd_ms"] = round(t * 1e3, 4)
        out["bwd_tflops"] = round(3 * fwd_flops / t / 1e12, 2)

    if "fp8" in what:
        from flashattention_tpu.ops.pallas_fp8 import pallas_fp8_attention

        def fp8_one(q_, k_, v_):
            return pallas_fp8_attention(q_, k_, v_)[0].astype(q_.dtype)
        t = two_point(fp8_one, q, (k, v), 30, 30 + 300 * scale)
        out["fp8_ms"] = round(t * 1e3, 4)
        out["fp8_tflops"] = round(fwd_flops / t / 1e12, 2)

    if "int8" in what:
        # FA3 int8 payload format: full call incl. the quantize pre-pass
        # (mirrors the fp8 leg), fused at every shape (no decode chain).
        from flashattention_tpu.ops.pallas_fp8 import pallas_fp8_attention

        def int8_one(q_, k_, v_):
            return pallas_fp8_attention(
                q_, k_, v_, fmt="int8"
            )[0].astype(q_.dtype)
        t = two_point(int8_one, q, (k, v), 30, 30 + 300 * scale)
        out["int8_ms"] = round(t * 1e3, 4)
        out["int8_tflops"] = round(fwd_flops / t / 1e12, 2)

    if "decode" in what:
        # Paged decode at the decode_r02.json shape (B=64, H=H_kv=8,
        # len 2048, d=128, page 64, bf16 cache). Chained: the step's output
        # token feeds back as the next query. Kernel variant (flat vs
        # merged schedule) comes from FAT_PAGED_MERGED via the parent.
        from flashattention_tpu.ops.pallas_paged import (
            pallas_paged_attention,
        )

        db, dh, dlen, dd, dpage = 64, 8, 2048, 128, 64
        npg = dlen // dpage
        kp = jax.random.normal(
            jax.random.key(10), (dh, db * npg + 1, dpage, dd), jnp.bfloat16
        )
        vp = jax.random.normal(
            jax.random.key(11), (dh, db * npg + 1, dpage, dd), jnp.bfloat16
        )
        dpi = jnp.arange(db * npg, dtype=jnp.int32).reshape(db, npg)
        dlens = jnp.full((db,), dlen, jnp.int32)
        dq = jax.random.normal(jax.random.key(12), (db, dh, dd), jnp.bfloat16)

        pps = os.environ.get("FAT_PAGED_PPS")
        pps = int(pps) if pps else None

        def dec_one(q_, kp_, vp_, pi_, ln_):
            return pallas_paged_attention(
                q_, kp_, vp_, pi_, ln_, pages_per_step=pps
            ).astype(q_.dtype)
        t = two_point(dec_one, dq, (kp, vp, dpi, dlens), 30, 330)
        out["decode_ms"] = round(t * 1e3, 4)
        out["decode_tokens_per_s"] = round(db / t, 1)
        kv_bytes = 2 * db * dh * dlen * dd * 2
        out["decode_kv_gbps"] = round(kv_bytes / t / 1e9, 1)

    if "qdecode" in what:
        # Quantized paged decode at the same shape as `decode`: 1-byte
        # payloads + per-slot fp32 scales (A/B for the scale-fold,
        # decode_r03.json's 2.3x quantized slowdown). FAT_QDECODE_QUANT
        # picks the payload dtype (fp8 default; int8 for the MXU-path A/B).
        from flashattention_tpu.ops.pallas_paged import (
            pallas_paged_attention,
        )

        qd_dtype = (
            jnp.int8 if os.environ.get("FAT_QDECODE_QUANT") == "int8"
            else jnp.float8_e4m3fn
        )
        db, dh, dlen, dd, dpage = 64, 8, 2048, 128, 64
        npg = dlen // dpage
        kp8 = jax.random.normal(
            jax.random.key(10), (dh, db * npg + 1, dpage, dd), jnp.float32
        ).astype(qd_dtype)
        vp8 = jax.random.normal(
            jax.random.key(11), (dh, db * npg + 1, dpage, dd), jnp.float32
        ).astype(qd_dtype)
        ksc = jax.random.uniform(
            jax.random.key(13), (dh, db * npg + 1, dpage, 1), jnp.float32,
            0.01, 0.02,
        )
        vsc = jax.random.uniform(
            jax.random.key(14), (dh, db * npg + 1, dpage, 1), jnp.float32,
            0.01, 0.02,
        )
        dpi = jnp.arange(db * npg, dtype=jnp.int32).reshape(db, npg)
        dlens = jnp.full((db,), dlen, jnp.int32)
        dq = jax.random.normal(jax.random.key(12), (db, dh, dd), jnp.bfloat16)

        pps = os.environ.get("FAT_PAGED_PPS")
        pps = int(pps) if pps else None

        def qdec_one(q_, kp_, vp_, ks_, vs_, pi_, ln_):
            return pallas_paged_attention(
                q_, kp_, vp_, pi_, ln_, k_scales=ks_, v_scales=vs_,
                pages_per_step=pps,
            ).astype(q_.dtype)
        t = two_point(qdec_one, dq, (kp8, vp8, ksc, vsc, dpi, dlens), 30, 330)
        out["qdecode_ms"] = round(t * 1e3, 4)
        out["qdecode_tokens_per_s"] = round(db / t, 1)
        payload_bytes = 2 * db * dh * dlen * dd * 1
        out["qdecode_payload_gbps"] = round(payload_bytes / t / 1e9, 1)

    if "sol" in what:
        m = 6144
        a0 = jax.random.normal(jax.random.key(7), (m, m), jnp.bfloat16)
        b0 = jax.random.normal(jax.random.key(8), (m, m), jnp.bfloat16)

        def mm_one(x, y):
            return jnp.dot(
                x, y, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        t = two_point(mm_one, a0, (b0,), 30, 510)
        out["sol_tflops"] = round(2 * m**3 / t / 1e12, 1)

    print("TIMING " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
