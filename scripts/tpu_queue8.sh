#!/bin/bash
# Round-3 queue 4: int8-MXU decode verify+A/B, fp8 magic-chain A/B,
# scale-fold verify v2 (TPU-class tolerances — queue7's 5e-5 assert was
# CPU-calibrated; CPU repro at HEAD reads 4e-7 everywhere, so the 1e-3..8e-3
# TPU deltas are Mosaic fp32-matmul precision class, and its q_len=16 >
# length=1 chunked-prefill config was invalid: fully-masked rows nan in the
# flat kernel by contract), queue6's two dropped verifies, the lagged-max
# forward A/B, and the serving-step attribution (VERDICT r2 weak #5 —
# queue7 confirmed old f216024 3.17-3.35 ms vs HEAD 4.28-4.33 ms).
#
# Usage: scripts/tpu_queue8.sh <sha> [max_wait_minutes]
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue8.sh <sha> [max_wait_minutes]}
WT=/tmp/fat_q8_$SHA
LOGDIR=$REPO/benchmarks/results/queue8
mkdir -p "$LOGDIR"
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$SHA" || exit 1
fi
grep -rl 'sys.path.insert(0, "/root/repo")' "$WT/scripts" 2>/dev/null | \
  xargs -r sed -i "s|sys.path.insert(0, \"/root/repo\")|sys.path.insert(0, \"$WT\")|"
cd "$WT"
export PYTHONPATH="$WT${PYTHONPATH:+:$PYTHONPATH}"
echo "worktree: $WT  logs: $LOGDIR"

live() {
  timeout 75 python - <<'EOF' >/dev/null 2>&1
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
EOF
}

MAX_POLLS=$(( ${2:-240} * 60 / 95 ))
n=0
until live; do
  n=$((n+1))
  echo "wedged poll $n/$MAX_POLLS $(date +%H:%M:%S)"
  [ "$n" -ge "$MAX_POLLS" ] && { echo "GAVE UP: still wedged"; exit 1; }
  sleep 20
done
echo "TPU LIVE $(date +%H:%M:%S)"

step() {
  local name=$1 to=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  local ok="" i=0
  until live; do
    i=$((i+1))
    if [ "$i" -ge 28 ]; then break; fi
    echo "   busy/wedged, waiting ($i/28) $(date +%H:%M:%S)"
    sleep 45
  done
  [ "$i" -lt 28 ] && ok=1
  if [ -n "$ok" ]; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -4 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged >20min" | tee "$LOGDIR/$name.SKIPPED"
  fi
}

# ---- 0. int8-MXU + fp8-magic decode: TPU compile + parity ------------------
step verify_int8_mxu 1800 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import os, time
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)

B, Hkv, Hq, page, pps, d = 4, 4, 8, 64, 8, 128
maxlen = page * pps
lengths = jnp.array([maxlen, page * 3 + 17, 16, page * 5], jnp.int32)
pi = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)
ks = jax.random.normal(jax.random.key(0), (B, Hkv, maxlen, d), jnp.float32)
vs = jax.random.normal(jax.random.key(1), (B, Hkv, maxlen, d), jnp.float32)
q = jax.random.normal(jax.random.key(9), (B, Hq, d), jnp.float32)
q4 = jax.random.normal(jax.random.key(11), (B, Hq, 16, d), jnp.float32)
failures = 0

def build(quant):
    cache = init_paged_cache(Hkv, B * pps + 2, page, d, quant=quant)
    return append_to_pages(cache, ks, vs, pi, jnp.zeros((B,), jnp.int32),
                           valid_len=lengths)

# int8-MXU: decode + chunked prefill vs convert path and gather oracle.
# Tolerance 2.5e-2: q/p row-quant noise (~9e-3 on CPU) + TPU matmul class.
cache = build("int8")
o_ref = paged_attention_decode(q, cache, pi, lengths)
for flag in ("1", "0"):
    os.environ["FAT_PAGED_INT8_MXU"] = flag
    t0 = time.time()
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales, merged=True)
    err = np.abs(np.asarray(o) - np.asarray(o_ref)).max()
    ok = err < 2.5e-2
    print(f"int8 mxu={flag}: err={err:.2e} compile+run {time.time()-t0:.0f}s"
          f" {'OK' if ok else 'FAIL'}", flush=True)
    failures += 0 if ok else 1
    o4 = pallas_paged_attention(
        q4, cache.k_pages, cache.v_pages, pi, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales, merged=True)
    assert np.isfinite(np.asarray(o4)).all()
os.environ["FAT_PAGED_INT8_MXU"] = "0"

# fp8 magic chain vs surgery chain (same cache, merged kernel)
cache = build("fp8")
outs = {}
for chain in ("magic", "surgery"):
    os.environ["FAT_FP8_DECODE"] = chain
    t0 = time.time()
    outs[chain] = np.asarray(pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales, merged=True))
    print(f"fp8 chain={chain}: compile+run {time.time()-t0:.0f}s", flush=True)
err = np.abs(outs["magic"] - outs["surgery"]).max()
ok = err < 5e-3  # chains differ only on denormal payloads (flush-to-0)
print(f"fp8 magic vs surgery: err={err:.2e} {'OK' if ok else 'FAIL'}",
      flush=True)
failures += 0 if ok else 1
print("INT8-MXU", "PASS" if failures == 0 else f"FAIL({failures})",
      flush=True)
PYEOF

# ---- 1. scale-fold verify v2: TPU-class tolerances, valid prefill config ---
step verify_scale_fold_v2 1800 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)

B, Hkv, Hq, page, pps, d = 4, 4, 8, 64, 8, 128
maxlen = page * pps
# every length >= the chunked-prefill q_len (16): q_len > length is outside
# the engine contract and nans the flat kernel's fully-masked rows.
lengths = jnp.array([maxlen, page * 3 + 17, 16, page * 5], jnp.int32)
pi = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)

def build(quant):
    cache = init_paged_cache(Hkv, B * pps + 2, page, d, quant=quant)
    ks = jax.random.normal(jax.random.key(0), (B, Hkv, maxlen, d), jnp.float32)
    vs = jax.random.normal(jax.random.key(1), (B, Hkv, maxlen, d), jnp.float32)
    return append_to_pages(cache, ks, vs, pi, jnp.zeros((B,), jnp.int32),
                           valid_len=lengths)

failures = 0
q = jax.random.normal(jax.random.key(9), (B, Hq, d), jnp.float32)
# Tolerances vs the XLA fp32 gather oracle are REAL-TPU class: in-kernel
# fp32 dots run at bf16-pass precision regardless of Precision.HIGHEST
# (CPU interpret repro reads 4e-7 on every one of these legs — exactness
# is the CPU tests' job; queue7 measured 1.2e-3/7.7e-3/7.1e-3 here).
for quant, tol in ((None, 5e-3), ("int8", 2.5e-2), ("fp8", 2.5e-2)):
    cache = build(quant)
    for window, sinks in ((None, 0), (96, 0), (96, 32)):
        o_ref = paged_attention_decode(q, cache, pi, lengths,
                                       window=window, sinks=sinks)
        for merged in (False, True):
            o = pallas_paged_attention(
                q, cache.k_pages, cache.v_pages, pi, lengths,
                k_scales=cache.k_scales, v_scales=cache.v_scales,
                compute_dtype=jnp.float32, merged=merged,
                window=window, sinks=sinks,
            )
            err = np.abs(np.asarray(o) - np.asarray(o_ref)).max()
            ok = err < tol
            print(f"quant={quant} merged={merged} window={window} "
                  f"sinks={sinks}: err={err:.2e} {'OK' if ok else 'FAIL'}",
                  flush=True)
            failures += 0 if ok else 1

cache = build("fp8")
q4 = jax.random.normal(jax.random.key(11), (B, Hq, 16, d), jnp.float32)
outs = {}
for merged in (False, True):
    outs[merged] = pallas_paged_attention(
        q4, cache.k_pages, cache.v_pages, pi, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales,
        compute_dtype=jnp.float32, merged=merged,
    )
err = np.abs(np.asarray(outs[True]) - np.asarray(outs[False])).max()
ok = err < 1e-2
print(f"fp8 chunked-prefill merged-vs-flat: err={err:.2e} "
      f"{'OK' if ok else 'FAIL'}", flush=True)
failures += 0 if ok else 1
print("VERIFY-SCALE-FOLD-V2", "PASS" if failures == 0 else
      f"FAIL({failures})", flush=True)
PYEOF

# ---- 2-3. A/Bs: int8-MXU and fp8-magic quantized decode --------------------
step ab_int8_mxu 3600 python scripts/ab_compare.py \
  --env-a FAT_QDECODE_QUANT=int8,FAT_PAGED_INT8_MXU=1 \
  --env-b FAT_QDECODE_QUANT=int8 --what qdecode,sol --pairs 2

step ab_fp8_magic 3600 python scripts/ab_compare.py \
  --env-a FAT_FP8_DECODE=magic --env-b FAT_FP8_DECODE=surgery \
  --what qdecode,sol --pairs 2

# ---- 4. lagged-max forward A/B (commit 7fe0002, default off) ----------------
step ab_lagged_max 3600 python scripts/ab_compare.py \
  --env-a FAT_FWD_LAGGED_MAX=1 --what fwd,sol --pairs 2

# ---- 5. serving-step attribution (VERDICT weak #5) --------------------------
step serving_attrib 3600 python scripts/serving_attrib.py

# ---- 6. queue6's dropped verifies: fp8 window/sinks + softcap ratio ---------
step verify_fp8_window 1200 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_fp8 import (
    pallas_fp8_attention, quantize_tiles, _dequant,
)
from flashattention_tpu.ops.reference import reference_attention
b, h, n, d, W, S = 1, 4, 2048, 128, 512, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
for mode in ("fused", "predecode"):
    o, lse = pallas_fp8_attention(q, k, v, causal=True, mode=mode,
                                  window=W, sinks=S)
    q8, sq = quantize_tiles(q, 512); k8, sk = quantize_tiles(k, 1024)
    v8, sv = quantize_tiles(v, 1024)
    o_r, _ = reference_attention(
        _dequant(q8, sq, 512).astype(q.dtype),
        _dequant(k8, sk, 1024).astype(q.dtype),
        _dequant(v8, sv, 1024).astype(q.dtype),
        causal=True, window=W, sinks=S)
    err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
    print(f"mode={mode}: vs quantized oracle {err:.3e}", flush=True)
    assert err < 5e-2, (mode, err)
g = jax.grad(lambda t: jnp.sum(pallas_fp8_attention(
    t[0], t[1], t[2], causal=True, window=W, sinks=S
)[0].astype(jnp.float32)**2))((q, k, v))
assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
print("FP8-WINDOW PASS", flush=True)
PYEOF

step verify_softcap_fast 1500 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.reference import reference_attention
b, h, n, d = 1, 4, 4096, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16) * 4
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
o, _ = pallas_attention(q, k, v, causal=True, softcap=10.0)
o_r, _ = reference_attention(q, k, v, causal=True, softcap=10.0)
err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
print(f"softcap(_mosaic_tanh) fwd maxerr {err:.4f}", flush=True)
assert err < 5e-2, err
def mk(cap):
    @jax.jit
    def loop(n_, q0):
        def body(i, acc):
            o, _ = pallas_attention(acc, k, v, causal=True, softcap=cap)
            return o.astype(acc.dtype)
        return lax.fori_loop(0, n_, body, q0)
    return loop
def tp(loop):
    best = {10: 1e9, 110: 1e9}
    loop(jnp.int32(2), q)
    for _ in range(3):
        for it in (10, 110):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.int32(it), q)).ravel()[:4]
            best[it] = min(best[it], time.perf_counter() - t0)
    return (best[110] - best[10]) / 100
t_cap, t_plain = tp(mk(10.0)), tp(mk(None))
print(f"fwd {n=} softcap {t_cap*1e3:.3f} ms vs plain {t_plain*1e3:.3f} ms "
      f"(ratio {t_cap/t_plain:.2f}; was 3.52 with jnp.tanh — "
      f"queue5/verify_softcap.log)", flush=True)
print("SOFTCAP-FAST PASS", flush=True)
PYEOF

# ---- 7. serving merged-vs-flat A/B at the serving shape ---------------------
step ab_serving_merged 2400 bash -c '
  for pair in 1 2; do
    echo "--- pair $pair MERGED ($(date +%H:%M:%S))"
    timeout 600 python scripts/bench_serving.py --prefill-len 512 \
      --prefill-chunk 256 2>/dev/null | grep serving_decode
    echo "--- pair $pair FLAT ($(date +%H:%M:%S))"
    FAT_PAGED_MERGED=0 timeout 600 python scripts/bench_serving.py \
      --prefill-len 512 --prefill-chunk 256 2>/dev/null | grep serving_decode
  done
'

echo "QUEUE8 DONE $(date +%H:%M:%S)"
