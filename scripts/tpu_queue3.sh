#!/bin/bash
# Round-2 final TPU queue — reordered from tpu_queue2.sh so the
# driver-graded headline and the TPU-only correctness verifications land
# BEFORE the long A/Bs (a ~1h session must not spend its window inside a
# 3600s A/B while the headline goes unmeasured). Same discipline:
# liveness gate with retries, per-step timeout, sequential.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_queue3_$(date +%H%M%S)
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

step() {  # step <name> <timeout_s> <cmd...>
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

# 1. Driver-graded headline (bf16 fwd+bwd + fp8 fwd + matmul SOL).
step bench_headline 900 python bench.py

# 2. TPU-only correctness: sinks + window with q_len > 1 (scalar-prefetch
#    index-map path interpret mode cannot validate).
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

# 3. Serving bench with the fixed prefix-cache section.
step bench_serving2 1800 python scripts/bench_serving.py

# 4. A/Bs (longest last — fine if the wall clock cuts them).
step ab_bwd_stages 1800 python scripts/ab_compare.py --env-b FAT_BWD_STAGES=1 --what bwd,sol --pairs 2
step ab_bwd_oldnew 3600 python scripts/ab_compare.py --rev "${AB_OLD_REV:-5cc841f}" --what bwd,sol --pairs 2

echo "QUEUE3 DONE $(date +%H:%M:%S)"
