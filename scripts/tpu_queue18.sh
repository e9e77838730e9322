#!/bin/bash
# Round-5 queue 18 — second TPU batch:
#   1. d=256 bwd q-slab A/Bs (re-run: queue17 arms OOM'd scoped vmem —
#      the 12 MB budget fix gives the kernel stack its measured headroom).
#   2. d=64 forward block-shape probes (VERDICT item 2: 74-87 TF today;
#      matmul probe says ~0.69x-of-peak ceiling, so the kernel has room).
#   3. softcap chain candidates (poly / recip vs exp, vs no-cap control).
#   4. decode kernel stage attribution (noconvert / onehead arms) +
#      isolated convert-chain throughput (weak-#4 reconciliation).
#   5. distill a draft + spec-engine tokens/s at measured acceptance.
#   6. train MFU >= 0.60 artifact (no-remat config, lagged-max now default).
#
# Usage: scripts/tpu_queue18.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue18.sh <sha>}
WT=/tmp/fat_q18_$SHA
LOGDIR=$REPO/benchmarks/results/queue18
mkdir -p "$LOGDIR"

while pgrep -f "tpu_queue17.sh" >/dev/null 2>&1; do
  echo "waiting for queue17 ($(date +%H:%M:%S))"; sleep 120
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
    if [ "$i" -ge 30 ]; then break; fi
    echo "   busy/wedged, waiting ($i/30) $(date +%H:%M:%S)"
    sleep 60
  done
  [ "$i" -lt 30 ] && ok=1
  if [ -n "$ok" ]; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -4 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged" | tee "$LOGDIR/$name.SKIPPED"
  fi
}

# --- 1. d=256 bwd slab A/Bs (fixed budget) ---
step ab_bwd_slab_8k 3600 python scripts/ab_inproc.py \
  --what bwd --shape 1,8,8192,256 --causal \
  --env-a FAT_BWD_SLAB=0 --env-b FAT_BWD_SLAB=1 \
  --label-a split --label-b qslab --pairs 3

step ab_bwd_slab_16k 3600 python scripts/ab_inproc.py \
  --what bwd --shape 1,4,16384,256 --causal \
  --env-a FAT_BWD_SLAB=0 --env-b FAT_BWD_SLAB=1 \
  --label-a split --label-b qslab --pairs 3

# --- 2. d=64 forward block probes (each its own subprocess/compile) ---
for blk in "1024 1024" "512 2048" "1024 2048" "2048 1024" "2048 2048"; do
  set -- $blk
  step "d64_fwd_${1}x${2}" 1800 python scripts/tune_attention.py \
    --one "$1" "$2" --seq 8192 --dim 64 --heads 8
done

# --- 3. softcap chain candidates (overhead vs no-cap, one control) ---
step ab_softcap_exp 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,128 --causal \
  --kw-b softcap=30.0 --label-a nocap --label-b exp_cap --pairs 3

step ab_softcap_poly 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,128 --causal \
  --kw-b softcap=30.0 --env-b FAT_SOFTCAP_IMPL=poly \
  --label-a nocap --label-b poly_cap --pairs 3

step ab_softcap_recip 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,128 --causal \
  --kw-b softcap=30.0 --env-b FAT_SOFTCAP_IMPL=recip \
  --label-a nocap --label-b recip_cap --pairs 3

# --- 4. decode attribution + convert-chain isolation ---
step decode_attrib 3600 python scripts/decode_ablate.py \
  --ablate --variants bf16,int8-qk,fp8 \
  --out "$REPO/benchmarks/results/decode_attrib_r05.json"

step convert_probe 2400 python scripts/convert_probe.py \
  --out "$REPO/benchmarks/results/convert_probe_r05.json"

# --- 5. spec decode with a real draft ---
step distill_draft 5400 python scripts/distill_draft.py \
  --tpu --steps 400 --draft-steps 400 \
  --out "$REPO/benchmarks/results/distill_r05.json"

step bench_spec_ckpt 5400 python scripts/bench_spec_engine.py \
  --ckpt /tmp/fat_spec_ckpt --gamma 4 --tokens 128 --batch 4 \
  --out "$REPO/benchmarks/results/spec_engine_r05.json"

# --- 6. train MFU artifact (no-remat; lagged-max fwd now default) ---
step bench_train_noremat 3600 python scripts/bench_train.py \
  --no-remat --out "$REPO/benchmarks/results/train_r05_noremat.json"

echo "QUEUE18 DONE $(date +%H:%M:%S)"
