"""Decode defaults confirm: bf16 vs int8 paged decode, NO env overrides.

The engine-user experience of the round-4 defaults (int8-qk s8-MXU path +
payload-aware pages_per_step): build both caches, call
``pallas_paged_attention`` with no knobs, two-point-time both arms
interleaved.

All arrays are jit ARGUMENTS — the first version of this probe (queue14
inline) closed over the ~275 MB page pools, which embed as HLO constants
and exceed the remote-compile body limit (HTTP 413; CLAUDE.md hazard).

    python scripts/decode_defaults_confirm.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, seqlen, page = 64, 8, 128, 2048, 64
    npg = seqlen // page
    rng = np.random.default_rng(0)
    pi = jnp.asarray((rng.permutation(b * npg) + 1).reshape(b, npg),
                     jnp.int32)
    lengths = jnp.full((b,), seqlen, jnp.int32)
    q = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)

    @jax.jit
    def loop(n_, q0, kp, vp, ks, vs):
        def body(i, qq):
            o = pallas_paged_attention(qq, kp, vp, pi, lengths,
                                       k_scales=ks, v_scales=vs)
            return o.astype(qq.dtype)
        return lax.fori_loop(0, n_, body, q0)

    def arm(dtype, quantized):
        kp = jax.random.normal(jax.random.key(0), (h, b * npg + 1, page, d),
                               jnp.float32).astype(dtype)
        vp = jax.random.normal(jax.random.key(1), (h, b * npg + 1, page, d),
                               jnp.float32).astype(dtype)
        ks = vs = None
        if quantized:
            ks = jax.random.uniform(jax.random.key(3),
                                    (h, b * npg + 1, page, 1), jnp.float32,
                                    0.01, 0.02)
            vs = jax.random.uniform(jax.random.key(4),
                                    (h, b * npg + 1, page, 1), jnp.float32,
                                    0.01, 0.02)
        args = (kp, vp, ks, vs)
        _ = np.asarray(loop(jnp.int32(2), q, *args)).ravel()[:4]
        return args

    arms = {"bf16-default": arm(jnp.bfloat16, False),
            "int8-default": arm(jnp.int8, True)}

    def timed(args, it):
        t0 = time.perf_counter()
        _ = np.asarray(loop(jnp.int32(it), q, *args)).ravel()[:4]
        return time.perf_counter() - t0

    i1, i2 = 20, 180
    best = {k: {i1: 1e9, i2: 1e9} for k in arms}
    for _ in range(4):
        for it in (i1, i2):
            for k, args in arms.items():
                best[k][it] = min(best[k][it], timed(args, it))
        time.sleep(2)
    out = {}
    for k in arms:
        step_s = (best[k][i2] - best[k][i1]) / (i2 - i1)
        out[k] = {"step_ms": round(step_s * 1e3, 3),
                  "tokens_per_s": round(b / step_s, 1)}
        print(json.dumps({k: out[k]}), flush=True)
    win = (out["int8-default"]["tokens_per_s"]
           / out["bf16-default"]["tokens_per_s"])
    print(json.dumps({"metric": "decode_defaults_confirm",
                      "int8_over_bf16": round(win, 3),
                      "rows": out}), flush=True)


if __name__ == "__main__":
    main()
