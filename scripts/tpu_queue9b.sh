#!/bin/bash
# Round-3 queue 9b: tpu_queue9.sh re-ordered for a short session window
# (/tmp was wiped between sessions, so queue9 never fired and every remote
# compile is cold again). Value order: the serving append fix A/B
# (VERDICT r2 weak #5), the lagged-max headline A/B, the driver-headline
# bench.py (also warms the driver's compile cache), decode re-bench with
# the magic fp8 chain default, then the int8-FA3 hardware legs.
#
# Usage: scripts/tpu_queue9b.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue9b.sh <sha>}
WT=/tmp/fat_q9b_$SHA
LOGDIR=$REPO/benchmarks/results/queue9
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
  timeout 200 python - <<'EOF' >/dev/null 2>&1
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
EOF
}

step() {
  local name=$1 to=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  local ok="" i=0
  until live; do
    i=$((i+1))
    if [ "$i" -ge 10 ]; then break; fi
    echo "   busy/wedged, waiting ($i/10) $(date +%H:%M:%S)"
    sleep 45
  done
  [ "$i" -lt 10 ] && ok=1
  if [ -n "$ok" ]; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -4 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged" | tee "$LOGDIR/$name.SKIPPED"
  fi
}

# ---- 1. serving append experiments (the ~2.8 ms regression fix) -------------
step serving_attrib2 2400 python scripts/serving_attrib.py \
  --variants full,noappend,dus,uniq

# ---- 2. lagged-max forward A/B ----------------------------------------------
step ab_lagged_max 2400 python scripts/ab_compare.py \
  --env-a FAT_FWD_LAGGED_MAX=1 --env-b FAT_FWD_LAGGED_MAX=0 \
  --what fwd,sol --pairs 2

# ---- 3. driver headline (also warms the driver's bench.py compile cache) ----
step bench_headline 2400 python bench.py

# ---- 4. decode re-bench with the magic chain default ------------------------
step bench_decode_magic 2400 python scripts/bench_decode.py \
  --out "$REPO/benchmarks/results/decode_r03c.json"

# ---- 5. int8 FA3 fused kernel: TPU compile + parity -------------------------
step verify_int8_fa3 1800 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import time
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_fp8 import (
    pallas_fp8_attention, quantize_tiles, _dequant,
)
from flashattention_tpu.ops.reference import reference_attention
failures = 0
for (b, h, hkv, n, d) in ((1, 4, 4, 2048, 128), (1, 8, 2, 1024, 128)):
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, hkv, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, hkv, n, d), jnp.bfloat16)
    t0 = time.time()
    o, lse = pallas_fp8_attention(q, k, v, causal=True, fmt="int8")
    o = np.asarray(o, np.float32)
    print(f"shape {(b,h,hkv,n,d)}: compile+run {time.time()-t0:.0f}s",
          flush=True)
    q8, sq = quantize_tiles(q, 512, "int8")
    k8, sk = quantize_tiles(k, 1024, "int8")
    v8, sv = quantize_tiles(v, 1024, "int8")
    g = h // hkv
    o_r, _ = reference_attention(
        _dequant(q8, sq, 512).astype(jnp.bfloat16),
        jnp.repeat(_dequant(k8, sk, 1024), g, axis=1).astype(jnp.bfloat16),
        jnp.repeat(_dequant(v8, sv, 1024), g, axis=1).astype(jnp.bfloat16),
        causal=True)
    err = np.abs(o - np.asarray(o_r, np.float32)).max()
    ok = err < 5e-2
    print(f"  vs int8-quantized oracle: err={err:.3e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    failures += 0 if ok else 1
q = jax.random.normal(jax.random.key(5), (1, 4, 1024, 128), jnp.bfloat16)
k = jax.random.normal(jax.random.key(6), (1, 4, 1024, 128), jnp.bfloat16)
v = jax.random.normal(jax.random.key(7), (1, 4, 1024, 128), jnp.bfloat16)
g = jax.grad(lambda t: jnp.sum(pallas_fp8_attention(
    t[0], t[1], t[2], causal=True, fmt="int8"
)[0].astype(jnp.float32) ** 2))((q, k, v))
assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
print("INT8-FA3", "PASS" if failures == 0 else f"FAIL({failures})",
      flush=True)
PYEOF

# ---- 6. bandwidth-bound shape: bf16 vs fp8(magic) vs int8 -------------------
step bench_fp8_bw 2000 python scripts/bench_fp8_bw.py \
  --out "$REPO/benchmarks/results/fp8_bandwidth_r03b.json"

# ---- 7. three-way fwd timing at the headline shape ---------------------------
step time_formats_a 2400 python scripts/_time_attn.py \
  --shape 1,8,8192,128 --what fwd,fp8,int8,sol

echo "QUEUE9B DONE $(date +%H:%M:%S)"
