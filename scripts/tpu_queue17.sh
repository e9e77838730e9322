#!/bin/bash
# Round-5 queue 17 — first TPU batch for the VERDICT r4 items:
#   1. fp8 fused_cached (decode-once VMEM cache) parity + A/B vs predecode
#      at the headline shape (item 1: close the fp8 leg to >=0.85).
#   2. mm_dims_probe — which matmul dim at 64 halves MXU throughput
#      (item 2 design data: d=64 schedule).
#   3. d=256 backward q-slab decomposition: parity + A/B vs split at
#      N=8K and N=16K (item 3: the long-N cliff).
#   4. bench.py headline with the new fp8 auto mode + int8 leg.
#
# Usage: scripts/tpu_queue17.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue17.sh <sha>}
WT=/tmp/fat_q17_$SHA
LOGDIR=$REPO/benchmarks/results/queue17
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

# --- 1a. fp8 fused_cached TPU parity (vs fused and vs predecode class) ---
step verify_fp8_cached 1800 python - <<'EOF'
import sys; sys.path.insert(0, ".")
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_fp8 import pallas_fp8_attention

q = jax.random.normal(jax.random.key(0), (1, 8, 8192, 128), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (1, 8, 8192, 128), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (1, 8, 8192, 128), jnp.bfloat16)

@jax.jit
def run(mode, q, k, v):
    return pallas_fp8_attention(q, k, v, causal=True, mode=mode)

outs = {}
for mode in ("fused", "fused_cached", "predecode"):
    o, lse = jax.jit(lambda q_, k_, v_, m=mode: pallas_fp8_attention(
        q_, k_, v_, causal=True, mode=m))(q, k, v)
    outs[mode] = (np.asarray(o, np.float32), np.asarray(lse))
    print(mode, "finite:", np.isfinite(outs[mode][0]).all(), flush=True)
dcf = np.abs(outs["fused_cached"][0] - outs["fused"][0]).max()
dlse = np.abs(outs["fused_cached"][1] - outs["fused"][1]).max()
dcp = np.abs(outs["fused_cached"][0] - outs["predecode"][0]).max()
print(f"cached-vs-fused   o={dcf:.3e} lse={dlse:.3e}")
print(f"cached-vs-predec  o={dcp:.3e}")
assert dcf < 5e-2 and dlse < 5e-3, "cached must match fused on TPU"
assert dcp < 5e-2, "cached must sit in predecode's class"
# e5m2 leg too
for fmt in ("e5m2",):
    o1, _ = jax.jit(lambda q_, k_, v_: pallas_fp8_attention(
        q_, k_, v_, causal=True, mode="fused_cached", fmt=fmt))(q, k, v)
    o2, _ = jax.jit(lambda q_, k_, v_: pallas_fp8_attention(
        q_, k_, v_, causal=True, mode="fused", fmt=fmt))(q, k, v)
    d = np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32)).max()
    print(fmt, "cached-vs-fused", d)
    assert d < 5e-2
print("VERIFY_FP8_CACHED OK")
EOF

# --- 1b. A/B: predecode (old auto) vs fused_cached (new auto), fwd ---
step ab_fp8_cached_fwd 2400 python scripts/ab_inproc.py \
  --what fp8fwd --shape 1,8,8192,128 --causal \
  --kw-a mode=predecode --kw-b mode=fused_cached \
  --label-a predecode --label-b fused_cached --pairs 4

# --- 1c. same A/B through fwd+bwd (the headline quantity) ---
step ab_fp8_cached_bwd 2400 python scripts/ab_inproc.py \
  --what fp8bwd --shape 1,8,8192,128 --causal \
  --kw-a mode=predecode --kw-b mode=fused_cached \
  --label-a predecode --label-b fused_cached --pairs 4

# --- 2. matmul small-dim cost model (d=64 design) ---
step mm_dims 2400 python scripts/mm_dims_probe.py \
  --out "$REPO/benchmarks/results/mm_dims_r05.json"

# --- 3a. d=256 N=8K bwd: split (old non-resident route) vs q-slab ---
step ab_bwd_slab_8k 3600 python scripts/ab_inproc.py \
  --what bwd --shape 1,8,8192,256 --causal \
  --env-a FAT_BWD_SLAB=0 --env-b FAT_BWD_SLAB=1 \
  --label-a split --label-b qslab --pairs 3

# --- 3b. d=256 N=16K ---
step ab_bwd_slab_16k 3600 python scripts/ab_inproc.py \
  --what bwd --shape 1,4,16384,256 --causal \
  --env-a FAT_BWD_SLAB=0 --env-b FAT_BWD_SLAB=1 \
  --label-a split --label-b qslab --pairs 3

# --- 3c. slab parity on TPU (split vs slab grads) ---
step verify_bwd_slab 1800 python - <<'EOF'
import sys, os; sys.path.insert(0, ".")
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_attn import pallas_attention

q = jax.random.normal(jax.random.key(0), (1, 4, 8192, 256), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (1, 4, 8192, 256), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (1, 4, 8192, 256), jnp.bfloat16)

def make(env):
    os.environ["FAT_BWD_SLAB"] = env
    def loss(t):
        o, _ = pallas_attention(t[0], t[1], t[2], causal=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    f = jax.jit(jax.grad(loss))
    g = f((q, k, v))  # trace with env active
    os.environ.pop("FAT_BWD_SLAB", None)
    return tuple(np.asarray(x, np.float32) for x in g)

g_split = make("0")
g_slab = make("1")
for a, b_, nm in zip(g_split, g_slab, "qkv"):
    scale = max(np.abs(a).max(), 1e-6)
    print(nm, "max|d|", np.abs(a - b_).max(), "rel", np.abs(a - b_).max() / scale)
    assert np.abs(a - b_).max() / scale < 5e-2
print("VERIFY_BWD_SLAB OK")
EOF

# --- 4. headline with new fp8 auto + int8 leg ---
step bench_headline 3600 python bench.py

echo "QUEUE17 DONE $(date +%H:%M:%S)"
