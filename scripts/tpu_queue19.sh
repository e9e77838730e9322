#!/bin/bash
# Round-5 queue 19 — FINAL batch at the round's last HEAD:
#   1. reference-breadth sweep (fa2 fwd+bwd, full N x d grid) + the full
#      figure set (forward panels, mixed, ablation md/tex/png) at HEAD —
#      VERDICT r4 missing #5; tag sweep_r05.
#   2. decode defaults confirmation (no-env engine-user path).
#   3. bench.py headline (the driver runs its own at round end; this one
#      is the builder's from-HEAD record).
#
# Usage: scripts/tpu_queue19.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue19.sh <sha>}
WT=/tmp/fat_q19_$SHA
LOGDIR=$REPO/benchmarks/results/queue19
mkdir -p "$LOGDIR"

while pgrep -f "tpu_queue1[78].sh" >/dev/null 2>&1; do
  echo "waiting for queue17/18 ($(date +%H:%M:%S))"; sleep 120
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

# d64 in-kernel matmul ceiling (queue18b's run wedged before a reading)
step d64_mm_only 1800 env FAT_ABLATE_DIM=64 \
  python scripts/ablate_fwd.py mm_only 1024 1024

# convert-chain probe (fixed: accumulator-dependent slice defeats the
# unroll-CSE that produced queue18b's negative fits)
step convert_probe 2400 python scripts/convert_probe.py \
  --out "$REPO/benchmarks/results/convert_probe_r05.json"

step sweep_main 14400 python -m flashattention_tpu.bench.sweep \
  --algos fa2 --backends pallas --directions forward backward \
  --seqlens 512 1024 2048 4096 8192 16384 --dims 64 128 256 \
  --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r05 --plot --cell-timeout 900

step decode_defaults 3600 python scripts/decode_defaults_confirm.py \
  --out "$REPO/benchmarks/results/decode_defaults_r05.json"

step bench_headline 3600 python bench.py

echo "QUEUE19 DONE $(date +%H:%M:%S)"
