"""Paged-decode variant ablation, IN ONE PROCESS (same-window by design).

VERDICT r3 item 1: quantized decode must beat bf16 tokens/s. The residual
after the scale-fold is the per-element convert chain — this script
triangulates where the time goes by interleaving ALL variants' timing loops
round-robin in one chip window (the ab_inproc.py rationale):

  bf16        payload bf16 (the 0.77 ms/step reference, hbm_frac 0.852)
  int8        s8 payload, convert path (astype to bf16 in-kernel)
  int8-full   s8 payload, both matmuls on the int8 MXU (q + p row-quant)
  int8-qk     s8 payload, s8 QK + one astype for a bf16 PV (no p requant)
  fp8         e4m3 payload, magic decode chain
  e5m2        e5m2 payload, shift-only magic chain (no denormal special case)

plus a --pps sweep (pages_per_step) on the winning int8 variant.

Usage: python scripts/decode_ablate.py [--out results.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--len", type=int, default=2048, dest="seqlen")
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--variants", default=None,
                    help="comma list of base variants to run (default all); "
                         "pps arms filter by their base name")
    ap.add_argument("--ablate", action="store_true",
                    help="add kernel-stage attribution arms (noconvert/"
                         "onehead; outputs wrong by design, timing only)")
    ap.add_argument("--pps", default=None,
                    help="comma list of pages_per_step for extra int8 rows")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d = args.batch, args.heads, args.dim
    seqlen, page = args.seqlen, args.page
    npg = seqlen // page
    num_pages = b * npg + 1

    rng = np.random.default_rng(0)
    perm = rng.permutation(b * npg) + 1
    pi = jnp.asarray(perm.reshape(b, npg), jnp.int32)
    lengths = jnp.full((b,), seqlen, jnp.int32)
    q = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)

    def payloads(dtype):
        kp = jax.random.normal(
            jax.random.key(0), (h, num_pages, page, d), jnp.float32
        ).astype(dtype)
        vp = jax.random.normal(
            jax.random.key(1), (h, num_pages, page, d), jnp.float32
        ).astype(dtype)
        ksc = jax.random.uniform(
            jax.random.key(3), (h, num_pages, page, 1), jnp.float32,
            0.01, 0.02)
        vsc = jax.random.uniform(
            jax.random.key(4), (h, num_pages, page, 1), jnp.float32,
            0.01, 0.02)
        return kp, vp, ksc, vsc

    def make_variant(dtype, env, quantized, pps=None):
        kp, vp, ksc, vsc = payloads(dtype)
        if not quantized:
            ksc = vsc = None
        saved = {kk: os.environ.get(kk) for kk in env}
        os.environ.update(env)
        try:
            @jax.jit
            def loop(n_, q0, kp_, vp_, ks_, vs_, pi_, ln_):
                def body(i, qq):
                    o = pallas_paged_attention(
                        qq, kp_, vp_, pi_, ln_, k_scales=ks_, v_scales=vs_,
                        pages_per_step=pps,
                    )
                    return o.astype(qq.dtype)
                return lax.fori_loop(0, n_, body, q0)

            call = (q, kp, vp, ksc, vsc, pi, lengths)
            out = loop(jnp.int32(2), *call)   # compile with env active
            _ = np.asarray(out).ravel()[:8]
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv
        return loop, call

    variants = [
        ("bf16", jnp.bfloat16, {}, False, None),
        # the no-env engine-user default for quantized caches (int8-qk +
        # payload-aware pps since r4) — scripts/decode_defaults_confirm.py
        # runs just bf16 vs this pair
        ("int8-default", jnp.int8, {}, True, None),
        ("int8", jnp.int8, {"FAT_PAGED_INT8_MXU": "0"}, True, None),
        ("int8-full", jnp.int8, {"FAT_PAGED_INT8_MXU": "full"}, True, None),
        ("int8-qk", jnp.int8, {"FAT_PAGED_INT8_MXU": "qk"}, True, None),
        ("fp8", jnp.float8_e4m3fn, {"FAT_FP8_DECODE": "magic"}, True, None),
    ]
    if hasattr(jnp, "float8_e5m2"):
        variants.append(("e5m2", jnp.float8_e5m2, {}, True, None))
    # pps fairness sweep (round 4): the queue11 run gave only int8-qk the
    # extra pps arms and it won at pps=4 — every contender gets the same
    # arms before a default/win claim is recorded.
    for pps in (args.pps.split(",") if args.pps else []):
        p = int(pps)
        variants += [
            (f"bf16-pps{p}", jnp.bfloat16, {}, False, p),
            (f"int8-qk-pps{p}", jnp.int8, {"FAT_PAGED_INT8_MXU": "qk"},
             True, p),
            (f"fp8-pps{p}", jnp.float8_e4m3fn, {"FAT_FP8_DECODE": "magic"},
             True, p),
        ]

    if args.variants:
        want = set(args.variants.split(","))
        variants = [v for v in variants if v[0].split("-pps")[0] in want]

    if args.ablate:
        # Timing-attribution arms (outputs WRONG by design — kernel skips
        # the named stage; only the delta vs the prod arm is read):
        # noconvert = landing/convert stores skipped, onehead = one head's
        # softmax/PV update. Per-path, same pps as the prod arm.
        for base, dtype, env, quant in [
            ("int8-qk", jnp.int8, {"FAT_PAGED_INT8_MXU": "qk"}, True),
            ("bf16", jnp.bfloat16, {}, False),
            ("fp8", jnp.float8_e4m3fn, {"FAT_FP8_DECODE": "magic"}, True),
        ]:
            for ab in ("noconvert", "onehead"):
                variants.append((
                    f"{base}-{ab}", dtype,
                    {**env, "FAT_PAGED_ABLATE": ab}, quant, None,
                ))

    built = []
    for name, dtype, env, quantized, pps in variants:
        print(f"compiling {name} ...", flush=True)
        loop, call = make_variant(dtype, env, quantized, pps)
        built.append((name, dtype, quantized, loop, call))

    def timed(loop, iters, call):
        t0 = time.perf_counter()
        out = loop(jnp.int32(iters), *call)
        _ = np.asarray(out).ravel()[:8]
        return time.perf_counter() - t0

    i1, i2 = 20, 180
    best = {name: {i1: float("inf"), i2: float("inf")}
            for name, *_ in built}
    for t in range(args.trials):
        for it in (i1, i2):
            for name, dtype, quantized, loop, call in built:
                best[name][it] = min(best[name][it], timed(loop, it, call))
        time.sleep(2)

    rows = []
    for name, dtype, quantized, loop, call in built:
        step = (best[name][i2] - best[name][i1]) / (i2 - i1)
        isz = jnp.dtype(dtype).itemsize
        payload_bytes = 2 * b * h * seqlen * d * isz
        scale_bytes = 2 * b * h * seqlen * 4 if quantized else 0
        gbps = (payload_bytes + scale_bytes) / step / 1e9
        rows.append({
            "variant": name,
            "step_ms": round(step * 1e3, 3),
            "tokens_per_s": round(b / step, 1),
            "kv_read_gbps": round(gbps, 1),
            "hbm_frac": round(gbps / V5E_HBM_GBPS, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "metric": "paged_decode_variant_ablation",
        "shape": {"batch": b, "heads": h, "seqlen": seqlen, "page": page,
                  "head_dim": d},
        "timing": "two-point, all variants interleaved in one process",
        "backend": jax.default_backend(),
        "rows": rows,
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
