#!/bin/bash
# Round-4 queue 11 — the VERDICT r3 measurement legs, in value order:
#   1. decode variant ablation (VERDICT item 1: quantized decode must WIN;
#      int8-qk hybrid + e5m2 are the new arms) + pps sweep
#   2. lagged-max forward A/B, IN-PROCESS interleaved (item 3 — queue9's
#      subprocess A/B was confounded by a systematic per-process SOL split)
#   3. softcap cost adjudication, same in-process harness (item 9)
#   4. int8-FA3 fused kernel hardware verify + timing legs (item 5)
#   5. memory re-measure at HEAD (item 6 — the split-routing fix 1012320
#      landed AFTER memory_r03.json was recorded)
#   6. fp8 bandwidth-bound shape re-check (item 1 done-criterion)
#
# Usage: scripts/tpu_queue11.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue11.sh <sha>}
WT=/tmp/fat_q11_$SHA
LOGDIR=$REPO/benchmarks/results/queue11
mkdir -p "$LOGDIR"

# Wait for any prior TPU job (the e5m2 verify poller) to drain first —
# NEVER two TPU workloads at once.
while pgrep -f queue_verify.sh >/dev/null 2>&1; do
  echo "waiting for queue_verify.sh to finish ($(date +%H:%M:%S))"
  sleep 60
done

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
    if [ "$i" -ge 20 ]; then break; fi
    echo "   busy/wedged, waiting ($i/20) $(date +%H:%M:%S)"
    sleep 60
  done
  [ "$i" -lt 20 ] && ok=1
  if [ -n "$ok" ]; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -4 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged" | tee "$LOGDIR/$name.SKIPPED"
  fi
}

# ---- 1. decode variant ablation (one process, round-robin interleaved) ------
step decode_ablate 3600 python scripts/decode_ablate.py \
  --pps 2,4 --out "$REPO/benchmarks/results/decode_ablate_r04.json"

# ---- 2. lagged-max forward A/B, in-process ----------------------------------
step ab_lagged_inproc 3000 python scripts/ab_inproc.py \
  --env-b FAT_FWD_LAGGED_MAX=1 --what fwd --pairs 4 \
  --label-a base --label-b lagged

# ---- 3. softcap cost, in-process ---------------------------------------------
step ab_softcap_inproc 2400 python scripts/ab_inproc.py \
  --kw-b softcap=30.0 --causal --what fwd --pairs 3 \
  --label-a nocap --label-b softcap30

# ---- 4. int8-FA3 fused kernel: TPU compile + parity + timing ----------------
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

# ---- 5. fwd timing: bf16 vs fp8 vs int8 at the headline shape ----------------
step time_formats 2400 python scripts/_time_attn.py \
  --shape 1,8,8192,128 --what fwd,fp8,int8,sol

# ---- 6. memory re-measure at HEAD (split-routing fix in) ---------------------
step mem_r04 2400 python scripts/mem_vs_dense.py \
  --out "$REPO/benchmarks/results/memory_r04.json"

# ---- 7. fp8 bandwidth-bound shape --------------------------------------------
step bench_fp8_bw 2400 python scripts/bench_fp8_bw.py \
  --out "$REPO/benchmarks/results/fp8_bandwidth_r04.json"

echo "QUEUE11 DONE $(date +%H:%M:%S)"
