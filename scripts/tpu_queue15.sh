#!/bin/bash
# Round-4 queue 15 — post-measurement extras:
#   1. MoE train-step overhead vs matched-FLOPs dense (bench row for the
#      round-4 MoE/EP feature; scripts/bench_moe.py)
#
# Usage: scripts/tpu_queue15.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue15.sh <sha>}
WT=/tmp/fat_q15_$SHA
LOGDIR=$REPO/benchmarks/results/queue15
mkdir -p "$LOGDIR"

# Sequencing: wait for queues 12-14.
while pgrep -f "tpu_queue1[234].sh" >/dev/null 2>&1; do
  echo "waiting for queue12/13/14 ($(date +%H:%M:%S))"; sleep 120
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

step bench_moe 3600 python scripts/bench_moe.py \
  --out "$REPO/benchmarks/results/moe_r04.json"

# 2. int8-qk decode pps fine-grain: the queue12 fairness grid was coarse
# (2/4/8; pps4 won at 92,987 tok/s). If 3/5/6 beats 4, flip the
# payload-aware default in pallas_paged.py.
step decode_pps_fine 4800 python scripts/decode_ablate.py \
  --pps 3,5,6 --variants bf16,int8-qk \
  --out "$REPO/benchmarks/results/decode_pps_fine_r04.json"

# 2b. spec-engine bench rerun: queue14's run died in the ADJUDICATOR
# (padded_logits closed over the 168M-param pytree -> HTTP 413); params
# is now a jit argument.
step bench_spec_engine 3600 python scripts/bench_spec_engine.py \
  --gamma 4 --tokens 48 --batch 4 \
  --out "$REPO/benchmarks/results/spec_engine_r04.json"

# 3. decode defaults confirm rerun: the queue14 inline version closed
# over the page pools (HTTP 413 — CLAUDE.md jit-arguments hazard);
# scripts/decode_defaults_confirm.py passes them as jit arguments.
step decode_defaults_confirm 2400 python scripts/decode_defaults_confirm.py

echo "QUEUE15 DONE $(date +%H:%M:%S)"
