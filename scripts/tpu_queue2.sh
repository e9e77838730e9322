#!/bin/bash
# Follow-up sequential TPU queue — steps added after tpu_queue.sh started
# (a running bash script must never be edited in place: bash reads it by
# byte offset). Same discipline: liveness gate, per-step timeout, cheap
# verification before benches. Run AFTER tpu_queue.sh finishes.
#
# Usage: scripts/tpu_queue2.sh [max_wait_minutes]   (default 120)
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_queue2_$(date +%H%M%S)
mkdir -p "$LOGDIR"
echo "logs: $LOGDIR"

live() {
  timeout 75 python - <<'EOF' >/dev/null 2>&1
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
EOF
}

MAX_POLLS=$(( ${1:-120} * 60 / 95 ))
n=0
until live; do
  n=$((n+1))
  echo "wedged poll $n/$MAX_POLLS $(date +%H:%M:%S)"
  [ "$n" -ge "$MAX_POLLS" ] && { echo "GAVE UP: still wedged"; exit 1; }
  sleep 20
done
echo "TPU LIVE $(date +%H:%M:%S)"

step() {  # step <name> <timeout_s> <cmd...>
  # Liveness retries: queue-1 showed single 75 s liveness timeouts skipping
  # steps seconds before a 180-TFLOP/s window — one flicker must not cost a
  # step.
  local name=$1 to=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  local ok=""
  for attempt in 1 2 3; do
    if live; then ok=1; break; fi
    echo "   liveness flicker $attempt/3, retrying"
    sleep 30
  done
  if [ -n "$ok" ]; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -4 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged again"
  fi
}

# Steps queue-1 skipped on liveness flickers: the headline and two A/Bs.
step bench_headline 900 python bench.py
step ab_bwd_oldnew 3600 python scripts/ab_compare.py --rev "${AB_OLD_REV:-5cc841f}" --what bwd,sol --pairs 3
step ab_bwd_stages 2400 python scripts/ab_compare.py --env-b FAT_BWD_STAGES=1 --what bwd,sol --pairs 2

# Sinks + window with q_len > 1 (engine chunked prefill on a StreamingLLM
# model) on REAL TPU: the per-row band start + sink walk interaction is a
# scalar-prefetch index-map path that interpret mode cannot validate.
step verify_sinks_chunked_prefill 1200 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.ops.reference import reference_attention
from flashattention_tpu.serving.paged_kv import init_paged_cache, append_to_pages

b, h, d, psize, total, chunk = 2, 8, 128, 64, 2048, 256
window, sinks = 512, 96  # sinks span 1.5 pages
npg = total // psize
cache = init_paged_cache(h, b * npg + 2, psize, d, dtype=jnp.bfloat16)
kf = jax.random.normal(jax.random.key(0), (b, h, total, d), jnp.bfloat16)
vf = jax.random.normal(jax.random.key(1), (b, h, total, d), jnp.bfloat16)
pi = (jnp.arange(b * npg).reshape(b, -1) + 1).astype(jnp.int32)
lengths = jnp.asarray([total, total - 191], jnp.int32)
cache = append_to_pages(cache, kf, vf, pi, jnp.zeros((b,), jnp.int32),
                        valid_len=lengths)
q = jax.random.normal(jax.random.key(2), (b, h, chunk, d), jnp.bfloat16)
for merged in (False, True):
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, window=window, sinks=sinks, merged=merged,
    )
    assert np.isfinite(np.asarray(o, np.float32)).all()
    for row in range(b):
        ln = int(lengths[row])
        o_ref, _ = reference_attention(
            q[row:row + 1], kf[row:row + 1, :, :ln], vf[row:row + 1, :, :ln],
            causal=True, window=window, sinks=sinks,
        )
        err = np.abs(np.asarray(o[row], np.float32)
                     - np.asarray(o_ref[0], np.float32)).max()
        print(f"merged={merged} row={row}: maxerr {err:.3e}", flush=True)
        assert err < 5e-2, (merged, row, err)
print("SINKS-CHUNKED-PREFILL PASS", flush=True)
PYEOF

# Serving bench with the fixed prefix-cache section (dedicated prompt-sized
# config + compile warm-up): honest cold/warm admit speedup numbers.
step bench_serving2 2400 python scripts/bench_serving.py

echo "QUEUE2 DONE $(date +%H:%M:%S)"
