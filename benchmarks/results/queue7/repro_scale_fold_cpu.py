import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)

B, Hkv, Hq, page, pps, d = 4, 4, 8, 64, 8, 128
maxlen = page * pps
lengths = jnp.array([maxlen, page * 3 + 17, 1, page * 5], jnp.int32)
pi = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)

def build(quant):
    cache = init_paged_cache(Hkv, B * pps + 2, page, d, quant=quant)
    ks = jax.random.normal(jax.random.key(0), (B, Hkv, maxlen, d), jnp.float32)
    vs = jax.random.normal(jax.random.key(1), (B, Hkv, maxlen, d), jnp.float32)
    return append_to_pages(cache, ks, vs, pi, jnp.zeros((B,), jnp.int32),
                           valid_len=lengths)

q = jax.random.normal(jax.random.key(9), (B, Hq, d), jnp.float32)
for quant in (None, "int8", "fp8"):
    cache = build(quant)
    for window, sinks in ((None, 0), (96, 32)):
        o_ref = paged_attention_decode(q, cache, pi, lengths,
                                       window=window, sinks=sinks)
        for merged in (False, True):
            o = pallas_paged_attention(
                q, cache.k_pages, cache.v_pages, pi, lengths,
                k_scales=cache.k_scales, v_scales=cache.v_scales,
                compute_dtype=jnp.float32, merged=merged,
                window=window, sinks=sinks)
            err = np.abs(np.asarray(o) - np.asarray(o_ref)).max()
            print(f"quant={quant} merged={merged} window={window} sinks={sinks}: {err:.2e}")

# chunked prefill leg — note lengths[2]=1 < q_len=16 (the nan suspect)
cache = build("fp8")
q4 = jax.random.normal(jax.random.key(11), (B, Hq, 16, d), jnp.float32)
outs = {}
for merged in (False, True):
    outs[merged] = np.asarray(pallas_paged_attention(
        q4, cache.k_pages, cache.v_pages, pi, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales,
        compute_dtype=jnp.float32, merged=merged))
d_all = np.abs(outs[True] - outs[False])
print("chunked-prefill merged-vs-flat per-batch max:",
      [f"{d_all[i].max():.2e}" for i in range(B)])
print("nan in flat:", np.isnan(outs[False]).any(axis=(1,2,3)),
      " nan in merged:", np.isnan(outs[True]).any(axis=(1,2,3)))
