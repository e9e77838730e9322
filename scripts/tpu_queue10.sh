#!/bin/bash
# Round-3 queue 10: the in-place Pallas decode append (FAT_APPEND_PALLAS,
# ops/pallas_append.py) on real TPU — compile + parity drive, then the
# serving A/B against the shipped scatter append. Waits for queue9b.
#
# Usage: scripts/tpu_queue10.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue10.sh <sha>}
WT=/tmp/fat_q10_$SHA
LOGDIR=$REPO/benchmarks/results/queue10
mkdir -p "$LOGDIR"

n=0
while ! grep -q "QUEUE9B DONE" /tmp/queue9b_console.log 2>/dev/null; do
  n=$((n+1))
  if [ "$n" -ge 120 ]; then echo "queue9b wait timed out"; break; fi
  if [ -f /tmp/queue9b_console.log ]; then
    age=$(( $(date +%s) - $(stat -c %Y /tmp/queue9b_console.log) ))
    [ "$age" -gt 2700 ] && { echo "queue9b console stale ${age}s — proceeding"; break; }
  fi
  sleep 60
done
echo "queue10 starting $(date +%H:%M:%S)"

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

# ---- 1. compile + parity on real TPU (serving shapes) -----------------------
step verify_append_pallas 1500 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_append import pallas_append_decode

h, pages, page, d, b = 8, 128, 256, 128, 16
kp = jax.random.normal(jax.random.key(0), (h, pages, page, d), jnp.bfloat16)
vp = jax.random.normal(jax.random.key(1), (h, pages, page, d), jnp.bfloat16)
kn = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)
vn = jax.random.normal(jax.random.key(3), (b, h, d), jnp.bfloat16)
phys = jnp.arange(5, 5 + b, dtype=jnp.int32)
slot = (jnp.arange(b, dtype=jnp.int32) * 37) % page
ok = (jnp.arange(b) % 5 != 0)  # a few masked rows

want_k = np.asarray(kp, np.float32).copy()
want_v = np.asarray(vp, np.float32).copy()
pn, sn, okn = np.asarray(phys), np.asarray(slot), np.asarray(ok)
knn, vnn = np.asarray(kn, np.float32), np.asarray(vn, np.float32)
for i in range(b):
    if okn[i]:
        want_k[:, pn[i], sn[i], :] = knn[i]
        want_v[:, pn[i], sn[i], :] = vnn[i]

ko, vo = pallas_append_decode(kp, vp, kn, vn, phys, slot, ok)
ek = np.abs(np.asarray(ko, np.float32) - want_k).max()
ev = np.abs(np.asarray(vo, np.float32) - want_v).max()
print(f"append parity on TPU: k {ek:.3e}  v {ev:.3e}", flush=True)
assert ek == 0.0 and ev == 0.0, (ek, ev)
print("APPEND-PALLAS PASS", flush=True)
PYEOF

# ---- 2. serving A/B: shipped scatter vs in-place pallas append --------------
step serving_append_ab 2400 python scripts/serving_attrib.py \
  --variants full,pallas,noappend

echo "QUEUE10 DONE $(date +%H:%M:%S)"
