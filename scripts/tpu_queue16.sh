#!/bin/bash
# Round-4 queue 16 — reruns of the two queue14/15 steps that hit the
# HTTP-413 closed-over-constant hazard, at the SHA that fixes them.
#
# Usage: scripts/tpu_queue16.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue16.sh <sha>}
WT=/tmp/fat_q16_$SHA
LOGDIR=$REPO/benchmarks/results/queue16
mkdir -p "$LOGDIR"

while pgrep -f "tpu_queue1[2345].sh" >/dev/null 2>&1; do
  echo "waiting for queue12-15 ($(date +%H:%M:%S))"; sleep 120
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

step bench_spec_engine 3600 python scripts/bench_spec_engine.py \
  --gamma 4 --tokens 48 --batch 4 \
  --out "$REPO/benchmarks/results/spec_engine_r04.json"

echo "QUEUE16 DONE $(date +%H:%M:%S)"
