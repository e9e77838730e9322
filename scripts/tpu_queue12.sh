#!/bin/bash
# Round-4 queue 12 — measurement legs for the landed defaults + the
# long-outstanding reference-grid sweep (VERDICT r3 item 4), in value order:
#   1. headline bench with FAT_FWD_LAGGED_MAX default ON (item 3 done-check:
#      vs_baseline >= 0.85)
#   2. decode variant ablation FAIRNESS re-run — every contender gets the
#      same pps arms (bf16-ppsN rows new; queue11 only armed int8-qk)
#   3. serving step at HEAD (append-pallas default ON) vs the 3.2 ms old-rev
#      floor, bf16 + int8 arms (item 2 done-check)
#   4. spec decoding on the paged engine: tokens/s arms (item 8 bench row)
#   5. e5m2 fused verify, QUANT-class gate (2x e4m3's TPU class; queue11's
#      verify used the non-quant 8e-3 gate and failed at 1.56e-2)
#   6. fp8 fused-with-features vs forced-predecode A/B at a bandwidth-bound
#      shape (item 7 justification: fused+window+softcap should now win)
#   7. queue6 payload at HEAD: 16K spec cells + reference-breadth sweep
#      (tag sweep_r04)
#
# Usage: scripts/tpu_queue12.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue12.sh <sha>}
WT=/tmp/fat_q12_$SHA
LOGDIR=$REPO/benchmarks/results/queue12
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

# ---- 1. headline with lagged-max default ON ---------------------------------
step bench_headline 3600 python bench.py

# ---- 2. decode ablation, fairness arms ---------------------------------------
step decode_ablate_v2 4800 python scripts/decode_ablate.py \
  --pps 2,4,8 --out "$REPO/benchmarks/results/decode_ablate_r04b.json"

# ---- 3. serving step at HEAD (append-pallas ON), bf16 + int8 ----------------
step bench_serving_bf16 2400 python scripts/bench_serving.py
step bench_serving_int8 2400 python scripts/bench_serving.py --quant int8

# ---- 3b. serving attribution at HEAD: timing + buffer-assignment dump -------
step serving_attrib_r04 3600 python scripts/serving_attrib.py \
  --variants full,scatter,noattn,noappend
step serving_memdump 2400 python scripts/serving_attrib.py \
  --variants full,scatter,noappend --memdump

# ---- 4. spec decoding on the paged engine ------------------------------------
step bench_spec_engine 3600 python scripts/bench_spec_engine.py \
  --gamma 4 --tokens 48 --batch 4 \
  --out "$REPO/benchmarks/results/spec_engine_r04.json"

# ---- 5. e5m2 fused verify at the QUANT-class gate ----------------------------
step verify_e5m2_v2 1800 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_fp8 import (
    pallas_fp8_attention, _prepare_fp8, _dequant_bf16,
)
from flashattention_tpu.ops.reference import reference_attention
BQ, BK = 512, 1024
b, h, n, d = 1, 4, 2048, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
fails = 0
for causal in (False, True):
    o, lse = pallas_fp8_attention(q, k, v, causal=causal, mode="fused",
                                  fmt="e5m2", block_q=BQ, block_k=BK)
    q8, k8, v8, sq, sk, sv, bq, bk, *_ = _prepare_fp8(q, k, v, BQ, BK, "e5m2")
    o_r, lse_r = reference_attention(
        _dequant_bf16(q8, sq, bq), _dequant_bf16(k8, sk, bk),
        _dequant_bf16(v8, sv, bk), causal=causal)
    do = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
    dl = np.abs(np.asarray(lse, np.float32) - np.asarray(lse_r, np.float32)).max()
    # Gate: 2x the e4m3 TPU precision class (e5m2 has one fewer mantissa
    # bit; CLAUDE.md class is 1e-3..8e-3 -> 1.6e-2). CPU interpret already
    # pins exactness at 5e-3 (tests/test_fp8.py e5m2 fused).
    ok = do < 1.6e-2 and dl < 1.6e-2
    print(f"e5m2 fused causal={causal}: d_o={do:.2e} d_lse={dl:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    fails += 0 if ok else 1
print("E5M2-V2", "PASS" if fails == 0 else f"FAIL({fails})", flush=True)
PYEOF

# ---- 6. fp8 fused+features vs forced predecode at a bandwidth-bound shape ---
step ab_fp8_featured 2400 python scripts/ab_inproc.py \
  --what fp8feat --shape 1,8,32768,128 --pairs 3 \
  --label-a predecode --label-b fused

# ---- 7. the queue6 payload at HEAD (VERDICT r3 item 4) -----------------------
cp -f "$REPO/benchmarks/results/queue6/grid_16k.log" "$LOGDIR/grid_16k.prev" 2>/dev/null || true
step grid_16k 10800 bash -c '
  ARGS="--grid --seqs 16384 --timeout 1500 --attempts 2"
  [ -s "'"$LOGDIR"'/grid_16k.prev" ] && ARGS="$ARGS --resume '"$LOGDIR"'/grid_16k.prev"
  exec python scripts/tune_attention.py $ARGS
'

step sweep_main 14400 python -m flashattention_tpu.bench.sweep \
  --algos fa2 --backends pallas --directions forward backward \
  --seqlens 512 1024 2048 4096 8192 16384 --dims 64 128 256 \
  --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r04 --plot --cell-timeout 900

step sweep_algos 5400 python -m flashattention_tpu.bench.sweep \
  --algos fa1 fa3 --backends pallas --directions forward backward \
  --seqlens 1024 8192 --dims 128 --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r04_algos --cell-timeout 900

step sweep_fp8 5400 python -m flashattention_tpu.bench.sweep \
  --algos fa3 --fp8 --backends pallas --directions forward backward \
  --seqlens 1024 8192 --dims 128 --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r04_fp8 --cell-timeout 900

step sweep_b2 3600 python -m flashattention_tpu.bench.sweep \
  --algos fa2 --backends pallas --directions forward backward \
  --seqlens 2048 8192 --dims 128 --causal both --heads 8 --batch 2 \
  --out "$REPO/benchmarks/results" --tag sweep_r04_b2 --cell-timeout 900

echo "QUEUE12 DONE $(date +%H:%M:%S)"
