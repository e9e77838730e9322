#!/bin/bash
# Round-3 queue 5: the int8 FA3 format on real TPU (verify + three-way
# timing vs bf16/fp8 at the headline shape + the bandwidth-bound shape),
# the fixed lagged-max A/B, the serving append experiments (dus/uniq —
# queue8 localized the 2.8 ms/step regression to scatter+pallas-consumer),
# and a decode re-bench with the magic fp8 chain now default (1.29x,
# queue8/ab_fp8_magic). Waits for queue8 to finish, then runs; removes
# /tmp/fat_queue_defer6 at the end so the deferred queue6 sweep proceeds.
#
# Usage: scripts/tpu_queue9.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue9.sh <sha>}
WT=/tmp/fat_q9_$SHA
LOGDIR=$REPO/benchmarks/results/queue9
mkdir -p "$LOGDIR"

# Wait for queue8: its DONE line, or its console going stale (died).
n=0
while ! grep -q "QUEUE8 DONE" /tmp/queue8_console.log 2>/dev/null; do
  n=$((n+1))
  if [ "$n" -ge 150 ]; then echo "queue8 wait timed out"; break; fi
  if [ -f /tmp/queue8_console.log ]; then
    age=$(( $(date +%s) - $(stat -c %Y /tmp/queue8_console.log) ))
    [ "$age" -gt 1500 ] && { echo "queue8 console stale ${age}s — proceeding"; break; }
  fi
  sleep 60
done
echo "queue9 starting $(date +%H:%M:%S)"

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

# ---- 0. int8 FA3 fused kernel: TPU compile + parity -------------------------
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
# grads finite through the STE backward on TPU
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

# ---- 1. three-way fwd timing at the headline shape (two same-window runs) ---
step time_formats_a 2400 python scripts/_time_attn.py \
  --shape 1,8,8192,128 --what fwd,fp8,int8,sol
step time_formats_b 2400 python scripts/_time_attn.py \
  --shape 1,8,8192,128 --what fwd,fp8,int8,sol

# ---- 2. bandwidth-bound shape: bf16 vs fp8(magic) vs int8 -------------------
step bench_fp8_bw 2400 python scripts/bench_fp8_bw.py \
  --out "$REPO/benchmarks/results/fp8_bandwidth_r03b.json"

# ---- 3. lagged-max A/B, fixed invocation ------------------------------------
step ab_lagged_max 3600 python scripts/ab_compare.py \
  --env-a FAT_FWD_LAGGED_MAX=1 --env-b FAT_FWD_LAGGED_MAX=0 \
  --what fwd,sol --pairs 2

# ---- 4. serving append experiments (dus / uniq vs full / noappend) ----------
step serving_attrib2 3600 python scripts/serving_attrib.py \
  --variants full,noappend,dus,uniq

# ---- 5. decode re-bench with the magic chain default ------------------------
step bench_decode_magic 2400 python scripts/bench_decode.py \
  --out "$REPO/benchmarks/results/decode_r03c.json"

rm -f /tmp/fat_queue_defer6
echo "QUEUE9 DONE $(date +%H:%M:%S) (queue6 defer released)"
