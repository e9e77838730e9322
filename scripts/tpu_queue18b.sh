#!/bin/bash
# Round-5 queue 18b — reruns of the queue18 steps invalidated by late
# wiring/bugs, plus the d=64 interleave A/B:
#   1. softcap poly/recip A/Bs (the chain impls now actually reach the
#      kernels; queue18's arms measured exp-vs-exp).
#   2. decode stage attribution (the --variants filter had dropped the
#      ablation arms) + isolated convert-chain throughput probe.
#   3. d=64 forward: FAT_FWD_SUBTILES A/B (production kernel) + the
#      ablate_fwd mm_only/twostep variants at D=64 for the cost model.
#   4. bench.py headline (int8obwd leg first TPU reading).
#
# Usage: scripts/tpu_queue18b.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue18b.sh <sha>}
WT=/tmp/fat_q18b_$SHA
LOGDIR=$REPO/benchmarks/results/queue18b
mkdir -p "$LOGDIR"

while pgrep -f "tpu_queue1[789].sh" >/dev/null 2>&1; do
  echo "waiting for other queues ($(date +%H:%M:%S))"; sleep 120
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

# --- 1. softcap chain A/Bs (real this time) ---
step ab_softcap_poly 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,128 --causal \
  --kw-b softcap=30.0 --env-b FAT_SOFTCAP_IMPL=poly \
  --label-a nocap --label-b poly_cap --pairs 3

step ab_softcap_recip 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,128 --causal \
  --kw-b softcap=30.0 --env-b FAT_SOFTCAP_IMPL=recip \
  --label-a nocap --label-b recip_cap --pairs 3

# --- 2. decode attribution + convert probe ---
step decode_attrib 3600 python scripts/decode_ablate.py \
  --ablate --variants bf16,int8-qk,fp8 \
  --out "$REPO/benchmarks/results/decode_attrib_r05.json"

step convert_probe 2400 python scripts/convert_probe.py \
  --out "$REPO/benchmarks/results/convert_probe_r05.json"

# --- 3. d=64 forward interleave ---
step ab_d64_subs2 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,64 --blocks 1024,1024 \
  --env-b FAT_FWD_SUBTILES=2 --label-a subs1 --label-b subs2 --pairs 3

step ab_d64_subs4 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,64 --blocks 1024,1024 \
  --env-b FAT_FWD_SUBTILES=4 --label-a subs1 --label-b subs4 --pairs 3

# PROVENANCE (post-hoc, ADVICE r5): the step NAME says subs2 but the arm
# that ran is FAT_FWD_SUBTILES=4 at blocks (512,2048) — the committed
# ab_d64_subs2_2048.log records a subs=4 datapoint (label subs4w is the
# truthful one). The subs=2/(512,2048) cell was never measured; the
# interleave verdict (negative at every measured cell) does not rest on it.
step ab_d64_subs2_2048 2400 python scripts/ab_inproc.py \
  --what fwd --shape 1,8,8192,64 --blocks 512,2048 \
  --env-b FAT_FWD_SUBTILES=4 --label-a subs1 --label-b subs4w --pairs 3

for mode in mm_only prod twostep2 twostep4 bf16exp; do
  step "d64_ablate_${mode}" 1200 env FAT_ABLATE_DIM=64 \
    python scripts/ablate_fwd.py "$mode" 1024 1024
done

# --- 4. headline with the int8obwd leg ---
step bench_headline 3600 python bench.py

echo "QUEUE18B DONE $(date +%H:%M:%S)"
