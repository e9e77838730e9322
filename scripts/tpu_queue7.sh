#!/bin/bash
# Round-3 queue 3: quantized-decode scale-fold verification + A/B, fixed
# serving old-rev A/B (queue5's failed: PYTHONPATH=$WT dropped
# /root/.axon_site so sitecustomize never registered the axon backend).
# Run BEFORE tpu_queue6.sh (short; unblocks the decode story).
#
# Usage: scripts/tpu_queue7.sh <sha> [max_wait_minutes]
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue7.sh <sha> [max_wait_minutes]}
WT=/tmp/fat_q7_$SHA
LOGDIR=$REPO/benchmarks/results/queue7
mkdir -p "$LOGDIR"
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$SHA" || exit 1
fi
# scripts pin sys.path[0]=/root/repo; repoint the worktree copies at $WT so
# the queue times THIS sha even while /root/repo's working tree moves on.
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

MAX_POLLS=$(( ${2:-240} * 60 / 95 ))
n=0
until live; do
  n=$((n+1))
  echo "wedged poll $n/$MAX_POLLS $(date +%H:%M:%S)"
  [ "$n" -ge "$MAX_POLLS" ] && { echo "GAVE UP: still wedged"; exit 1; }
  sleep 20
done
echo "TPU LIVE $(date +%H:%M:%S)"

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

# ---- 0. scale-fold correctness on REAL TPU (scalar-prefetch paths that
#         interpret mode cannot validate: lane-major scale BlockSpecs) ----
step verify_scale_fold 1800 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)

B, Hkv, Hq, page, pps, d = 4, 4, 8, 64, 8, 128
maxlen = page * pps
lengths = jnp.array([maxlen, page * 3 + 17, 1, page * 5], jnp.int32)
pi = jnp.arange(B * pps, dtype=jnp.int32).reshape(B, pps)

def build(quant):
    cache = init_paged_cache(Hkv, B * pps + 2, page, d, quant=quant)
    ks = jax.random.normal(jax.random.key(0), (B, Hkv, maxlen, d), jnp.float32)
    vs = jax.random.normal(jax.random.key(1), (B, Hkv, maxlen, d), jnp.float32)
    return append_to_pages(cache, ks, vs, pi, jnp.zeros((B,), jnp.int32),
                           valid_len=lengths)

failures = 0
q = jax.random.normal(jax.random.key(9), (B, Hq, d), jnp.float32)
for quant in (None, "int8", "fp8"):
    cache = build(quant)
    for window, sinks in ((None, 0), (96, 0), (96, 32)):
        o_ref = paged_attention_decode(q, cache, pi, lengths,
                                       window=window, sinks=sinks)
        for merged in (False, True):
            o = pallas_paged_attention(
                q, cache.k_pages, cache.v_pages, pi, lengths,
                k_scales=cache.k_scales, v_scales=cache.v_scales,
                compute_dtype=jnp.float32, merged=merged,
                window=window, sinks=sinks,
            )
            err = np.abs(np.asarray(o) - np.asarray(o_ref)).max()
            ok = err < 5e-5
            print(f"quant={quant} merged={merged} window={window} "
                  f"sinks={sinks}: err={err:.2e} {'OK' if ok else 'FAIL'}",
                  flush=True)
            failures += 0 if ok else 1

cache = build("fp8")
q4 = jax.random.normal(jax.random.key(11), (B, Hq, 16, d), jnp.float32)
outs = {}
for merged in (False, True):
    outs[merged] = pallas_paged_attention(
        q4, cache.k_pages, cache.v_pages, pi, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales,
        compute_dtype=jnp.float32, merged=merged,
    )
err = np.abs(np.asarray(outs[True]) - np.asarray(outs[False])).max()
ok = err < 5e-5
print(f"fp8 chunked-prefill merged-vs-flat: err={err:.2e} "
      f"{'OK' if ok else 'FAIL'}", flush=True)
failures += 0 if ok else 1
print("VERIFY-SCALE-FOLD", "PASS" if failures == 0 else f"FAIL({failures})")
PYEOF

# ---- 1. quantized-decode A/B: scale-fold (this sha) vs pre-fold af616e6 ----
step ab_qdecode 3600 python scripts/ab_compare.py \
  --rev af616e6 --what qdecode,sol --pairs 2

# ---- 2. full decode bench at the landed rev -------------------------------
step bench_decode 2400 python scripts/bench_decode.py \
  --out "$REPO/benchmarks/results/decode_r03b.json"

# ---- 3. serving old-rev A/B, PYTHONPATH fixed (VERDICT r2 item 6) ----------
step ab_serving_oldrev 3600 bash -c '
  set -u
  OLD=/tmp/fat_ab_f216024
  [ -d "$OLD" ] || git -C /root/repo worktree add --detach "$OLD" f216024
  # bench_serving.py pins sys.path[0]=/root/repo — repoint each copy at its
  # own tree so the legs time DIFFERENT revisions (the whole point).
  sed -i "s|sys.path.insert(0, \"/root/repo\")|sys.path.insert(0, \"$OLD\")|" \
    "$OLD/scripts/bench_serving.py"
  for pair in 1 2; do
    echo "--- pair $pair NEW ($(date +%H:%M:%S))"
    (cd '"$WT"' && PYTHONPATH='"$WT"':/root/.axon_site timeout 900 \
       python scripts/bench_serving.py --prefill-len 512 --prefill-chunk 256 \
       >/tmp/srv_new_$pair.log 2>&1)
    grep serving_decode /tmp/srv_new_$pair.log || tail -3 /tmp/srv_new_$pair.log
    echo "--- pair $pair OLD f216024 ($(date +%H:%M:%S))"
    (cd "$OLD" && PYTHONPATH="$OLD":/root/.axon_site timeout 900 \
       python scripts/bench_serving.py >/tmp/srv_old_$pair.log 2>&1)
    grep serving_decode /tmp/srv_old_$pair.log || tail -3 /tmp/srv_old_$pair.log
  done
'

echo "QUEUE7 DONE $(date +%H:%M:%S)"
