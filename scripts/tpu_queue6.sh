#!/bin/bash
# Round-3 queue 2: reference-breadth sweep + 16K spec-table cells
# (VERDICT r2 missing #2 and #4). Run AFTER tpu_queue5.sh.
#
# Reference grid being mirrored: benchmarks/bench_utils.py:250-263 —
# N in {512..16384}, d in {64,128,256}, B in {1,2}, causal both, algos,
# fp8 rows, fwd+bwd, 6-panel figures. The full cross product is ~400
# fresh remote Mosaic compiles — not feasible through the tunnel in one
# window — so: the flagship algo (fa2/pallas) runs the FULL grid, and the
# algo/fp8/batch axes run representative subsets (every axis measured,
# no axis extrapolated).
#
# Usage: scripts/tpu_queue6.sh <sha> [max_wait_minutes]
set -u
# Sequencing guard: another queue owns the chip while this sentinel exists
# (tpu_queue9.sh removes it when done). Never run two queues concurrently —
# interleaved dispatches poison both sides' timings.
while [ -e /tmp/fat_queue_defer6 ]; do
  echo "deferred: /tmp/fat_queue_defer6 present $(date +%H:%M:%S)"; sleep 60
done
REPO=/root/repo
SHA=${1:?usage: tpu_queue6.sh <sha> [max_wait_minutes]}
WT=/tmp/fat_q5_$SHA   # share queue5's worktree when present
LOGDIR=$REPO/benchmarks/results/queue6
mkdir -p "$LOGDIR"
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$SHA" || exit 1
fi
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

MAX_POLLS=$(( ${2:-180} * 60 / 95 ))
n=0
until live; do
  n=$((n+1))
  echo "wedged poll $n/$MAX_POLLS $(date +%H:%M:%S)"
  [ "$n" -ge "$MAX_POLLS" ] && { echo "GAVE UP: still wedged"; exit 1; }
  sleep 20
done
echo "TPU LIVE $(date +%H:%M:%S)"

step() {
  # Wait-until-live per step (bounded ~20 min) — see tpu_queue5.sh step().
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

# ---- 0. fp8 fused window/sinks TPU compile + parity (round-3 feature) ------
step verify_fp8_window 1200 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_fp8 import (
    pallas_fp8_attention, quantize_tiles, _dequant,
)
from flashattention_tpu.ops.reference import reference_attention
b, h, n, d, W, S = 1, 4, 2048, 128, 512, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
for mode in ("fused", "predecode"):
    o, lse = pallas_fp8_attention(q, k, v, causal=True, mode=mode,
                                  window=W, sinks=S)
    q8, sq = quantize_tiles(q, 512); k8, sk = quantize_tiles(k, 1024)
    v8, sv = quantize_tiles(v, 1024)
    o_r, _ = reference_attention(
        _dequant(q8, sq, 512).astype(q.dtype),
        _dequant(k8, sk, 1024).astype(q.dtype),
        _dequant(v8, sv, 1024).astype(q.dtype),
        causal=True, window=W, sinks=S)
    err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
    print(f"mode={mode}: vs quantized oracle {err:.3e}", flush=True)
    assert err < 5e-2, (mode, err)
g = jax.grad(lambda t: jnp.sum(pallas_fp8_attention(
    t[0], t[1], t[2], causal=True, window=W, sinks=S
)[0].astype(jnp.float32)**2))((q, k, v))
assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
print("FP8-WINDOW PASS", flush=True)
PYEOF

# ---- 0b. softcap cost ratio re-measure on REAL TPU -------------------------
# queue5 measured softcap at 3.5x whole-kernel forward cost at BOTH the
# jnp.tanh and the exp-form (_mosaic_tanh) revs — the cost is the VPU
# chain itself, not a tanh lowering bug. This step re-measures the ratio
# at whatever chain is shipped (see scripts/vpu_microbench.py for the
# per-op attribution used to pick it).
step verify_softcap_fast 1500 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.reference import reference_attention
b, h, n, d = 1, 4, 4096, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16) * 4
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
o, _ = pallas_attention(q, k, v, causal=True, softcap=10.0)
o_r, _ = reference_attention(q, k, v, causal=True, softcap=10.0)
err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
print(f"softcap(_mosaic_tanh) fwd maxerr {err:.4f}", flush=True)
assert err < 5e-2, err
g = jax.grad(lambda t: jnp.sum(pallas_attention(
    t[0], t[1], t[2], causal=True, softcap=10.0)[0].astype(jnp.float32)**2)
)((q, k, v))
assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
def mk(cap):
    @jax.jit
    def loop(n_, q0):
        def body(i, acc):
            o, _ = pallas_attention(acc, k, v, causal=True, softcap=cap)
            return o.astype(acc.dtype)
        return lax.fori_loop(0, n_, body, q0)
    return loop
def tp(loop):
    best = {10: 1e9, 110: 1e9}
    loop(jnp.int32(2), q)
    for _ in range(3):
        for it in (10, 110):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.int32(it), q)).ravel()[:4]
            best[it] = min(best[it], time.perf_counter() - t0)
    return (best[110] - best[10]) / 100
t_cap, t_plain = tp(mk(10.0)), tp(mk(None))
print(f"fwd {n=} softcap {t_cap*1e3:.3f} ms vs plain {t_plain*1e3:.3f} ms "
      f"(ratio {t_cap/t_plain:.2f}; was 3.52 with jnp.tanh — "
      f"queue5/verify_softcap.log)", flush=True)
print("SOFTCAP-FAST PASS", flush=True)
PYEOF

# ---- 1. 16K spec-table cells (ops/specs.py TODO; VERDICT missing #4) -------
cp -f "$LOGDIR/grid_16k.log" "$LOGDIR/grid_16k.prev" 2>/dev/null || true
step grid_16k 10800 bash -c '
  ARGS="--grid --seqs 16384 --timeout 1500 --attempts 2"
  [ -s "'"$LOGDIR"'/grid_16k.prev" ] && ARGS="$ARGS --resume '"$LOGDIR"'/grid_16k.prev"
  exec python scripts/tune_attention.py $ARGS
'

# ---- 2. flagship full-breadth sweep (fa2/pallas, fwd+bwd, causal both) -----
step sweep_main 14400 python -m flashattention_tpu.bench.sweep \
  --algos fa2 --backends pallas --directions forward backward \
  --seqlens 512 1024 2048 4096 8192 16384 --dims 64 128 256 \
  --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r03 --plot --cell-timeout 900

# ---- 3. algo axis: fa1 + fa3 at representative cells ------------------------
step sweep_algos 5400 python -m flashattention_tpu.bench.sweep \
  --algos fa1 fa3 --backends pallas --directions forward backward \
  --seqlens 1024 8192 --dims 128 --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r03_algos --cell-timeout 900

# ---- 4. fp8 axis: fa3 fp8 rows ----------------------------------------------
step sweep_fp8 5400 python -m flashattention_tpu.bench.sweep \
  --algos fa3 --fp8 --backends pallas --directions forward backward \
  --seqlens 1024 8192 --dims 128 --causal both --heads 8 --batch 1 \
  --out "$REPO/benchmarks/results" --tag sweep_r03_fp8 --cell-timeout 900

# ---- 5. batch axis: B=2 ------------------------------------------------------
step sweep_b2 3600 python -m flashattention_tpu.bench.sweep \
  --algos fa2 --backends pallas --directions forward backward \
  --seqlens 2048 8192 --dims 128 --causal both --heads 8 --batch 2 \
  --out "$REPO/benchmarks/results" --tag sweep_r03_b2 --cell-timeout 900

echo "QUEUE6 DONE $(date +%H:%M:%S)"
