#!/bin/bash
# Sequential TPU work queue — run after (or across) a wedged-tunnel window.
#
# The axon tunnel serves ONE shared v5e and wedges hard for 45+ min at a
# time (CLAUDE.md); TPU work must be queued sequentially, never in
# parallel, and each step needs its own `timeout` so a wedge mid-queue
# costs one step, not the session. Steps are ordered cheapest-first so a
# short healthy window still retires the verification drives.
#
# Usage: scripts/tpu_queue.sh [max_wait_minutes]   (default 120)
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_queue_$(date +%H%M%S)
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

# ---- 0. wait for liveness -------------------------------------------------
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
  local name=$1 to=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  if live; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -3 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged again"
  fi
}

# ---- 1. verify drives (cheap) --------------------------------------------
step verify_specpair 600 python - <<'EOF'
# Per-direction spec pair on real TPU: d=64 fwd (1024,1024) + bwd (512,1024)
# through the public fa2 dispatcher, fwd + grads vs oracle.
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
import flashattention_tpu as fat
ks = [jax.random.normal(jax.random.key(i), (1, 4, 2048, 64), jnp.bfloat16)
      for i in range(3)]
q, k, v = ks
o, lse = fat.fa2_attention(q, k, v, causal=True)
o_r, _ = fat.reference_attention(q, k, v, causal=True)
print("fwd max|d|:", np.abs(np.asarray(o, np.float32)
                            - np.asarray(o_r, np.float32)).max())
def loss(t):
    o, _ = fat.fa2_attention(t[0], t[1], t[2], causal=True)
    return jnp.sum(o.astype(jnp.float32) ** 2)
g = jax.grad(loss)((q, k, v))
gr = fat.reference_attention_grads(q, k, v, 2 * o_r.astype(jnp.float32),
                                   causal=True)
for name, a, b in zip("dq dk dv".split(), g, gr):
    print(name, "max|d|:", np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max())
EOF

step verify_speculative 600 python - <<'EOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from flashattention_tpu.models.transformer import TransformerConfig, init_transformer
from flashattention_tpu.serving import SamplingConfig, generate, speculative_generate
T = TransformerConfig(vocab_size=61, d_model=64, n_layers=2, n_heads=4,
                      d_ff=128, max_seq_len=64, block_size=32,
                      dropout_rate=0.0, dtype=jnp.float32,
                      attention_backend="xla")
D = TransformerConfig(vocab_size=61, d_model=32, n_layers=1, n_heads=2,
                      d_ff=64, max_seq_len=64, block_size=32,
                      dropout_rate=0.0, dtype=jnp.float32,
                      attention_backend="xla")
tp, dp = init_transformer(jax.random.key(0), T), init_transformer(jax.random.key(7), D)
want = generate(tp, T, [3, 17, 42], max_new_tokens=8)
got, st = speculative_generate(tp, dp, T, D, [3, 17, 42],
                               max_new_tokens=8, gamma=3)
assert got == want, (got, want)
print("greedy exact on TPU; accept", st.accepted, "/", st.proposed)
out, st2 = speculative_generate(
    tp, dp, T, D, [3, 17, 42], max_new_tokens=8, gamma=3,
    sampling=SamplingConfig(temperature=1.0), key=jax.random.key(5))
print("stochastic ok:", len(out) == 8, "accept", st2.accepted, "/", st2.proposed)
EOF

# ---- 2. headline ----------------------------------------------------------
step bench_headline 900 python bench.py

# ---- 3. fwd-block A/B at the headline shape (d=128) ----------------------
step ab_fwd_1024_d128 900 python scripts/tune_attention.py --one 1024 1024 --seq 8192 --dim 128
step ab_fwd_512_d128  900 python scripts/tune_attention.py --one 512 1024 --seq 8192 --dim 128
step ab_bwd_stages1 900 env FAT_BWD_STAGES=1 python scripts/tune_attention.py --one 512 1024 --seq 8192 --dim 128 --bwd
step ab_bwd_stages2 900 env FAT_BWD_STAGES=2 python scripts/tune_attention.py --one 512 1024 --seq 8192 --dim 128 --bwd

# ---- 3b. sliding-window tile-skip on real TPU (correct + fast) ------------
step verify_window 900 python - <<'EOF'
# N=8K window=1024: must match the banded oracle AND run ~3-4x faster than
# full causal (out-of-band tiles skipped, not just masked).
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.reference import reference_attention
b, h, n, d = 1, 4, 8192, 128
q, k, v = (jax.random.normal(jax.random.key(i), (b, h, n, d), jnp.bfloat16)
           for i in range(3))
o, lse = pallas_attention(q, k, v, causal=True, window=1024)
o_r, _ = reference_attention(q, k, v, causal=True, window=1024)
print("win fwd max|d|:", np.abs(np.asarray(o, np.float32)
                                - np.asarray(o_r, np.float32)).max())
def mkloop(fn):
    @jax.jit
    def loop(n_, a0, *rest):
        return lax.fori_loop(0, n_, lambda i, o_: fn(o_, *rest), a0)
    return loop
def two_point(loop, args, i1, i2):
    best = {i1: 1e9, i2: 1e9}
    for _ in range(3):
        for it in (i1, i2):
            t0 = time.perf_counter()
            out = loop(jnp.int32(it), *args)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]
            best[it] = min(best[it], time.perf_counter() - t0)
    return (best[i2] - best[i1]) / (i2 - i1)
win = mkloop(lambda q_, k_, v_: pallas_attention(
    q_, k_, v_, causal=True, window=1024)[0].astype(q_.dtype))
cau = mkloop(lambda q_, k_, v_: pallas_attention(
    q_, k_, v_, causal=True)[0].astype(q_.dtype))
win(jnp.int32(2), q, k, v); cau(jnp.int32(2), q, k, v)
t_w = two_point(win, (q, k, v), 30, 630)
t_c = two_point(cau, (q, k, v), 30, 630)
print(f"window=1024 {t_w*1e3:.3f} ms vs causal {t_c*1e3:.3f} ms "
      f"(speedup {t_c/t_w:.2f}x; band fraction {1024/n:.3f})")
EOF

# ---- 4. decode re-measure -------------------------------------------------
step bench_decode 1200 python scripts/bench_decode.py

# ---- 5. missing grid cells (expensive tail) -------------------------------
step grid_16k 7200 python scripts/tune_attention.py --grid --seqs 8192,16384 \
  --resume benchmarks/results/grid_r02.jsonl --timeout 700 --attempts 2

echo "QUEUE DONE $(date +%H:%M:%S) — logs in $LOGDIR"
