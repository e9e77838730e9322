#!/bin/bash
# Round-4 queue 13 — the lagged-max ports (fp8/int8 fused kernel + sparse
# kernel), landed AFTER queue12's SHA:
#   1. TPU compile + parity of the lagged fused fp8/int8/e5m2 kernels and
#      the lagged sparse kernel (CPU interpret passed; Mosaic is the gate)
#   2. in-process A/B: int8 fused fwd with vs without the lagged frame at
#      the headline shape (bf16 measured 11.6%; int8 should match)
#   3. decode defaults A/B if decode_ablate_v2 (queue12) recommended a
#      pps/int8-qk default change — run the confirming arm at this SHA
#
# Usage: scripts/tpu_queue13.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue13.sh <sha>}
WT=/tmp/fat_q13_$SHA
LOGDIR=$REPO/benchmarks/results/queue13
mkdir -p "$LOGDIR"

# Sequencing: wait for queue12 to finish (sentinel = its driver process).
while pgrep -f tpu_queue12.sh >/dev/null 2>&1; do
  echo "waiting for queue12 ($(date +%H:%M:%S))"; sleep 120
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
    if [ "$i" -ge 20 ]; then break; fi
    echo "   busy/wedged, waiting ($i/20) $(date +%H:%M:%S)"
    sleep 60
  done
  [ "$i" -lt 20 ] && ok=1
  if [ -n "$ok" ]; then
    timeout "$to" "$@" >"$LOGDIR/$name.log" 2>&1
    echo "   exit=$? (log $LOGDIR/$name.log)"
    tail -4 "$LOGDIR/$name.log" | sed 's/^/   /'
  else
    echo "   SKIPPED: window wedged" | tee "$LOGDIR/$name.SKIPPED"
  fi
}

# ---- 1. lagged fused/sparse kernels: TPU compile + parity -------------------
step verify_lagged_ports 2400 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import time
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_fp8 import (
    pallas_fp8_attention, _prepare_fp8, _dequant_bf16,
)
from flashattention_tpu.ops.pallas_sparse import pallas_sparse_attention
from flashattention_tpu.ops.reference import reference_attention
fails = 0
b, h, n, d = 1, 4, 2048, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
BQ, BK = 512, 1024
for fmt in ("fp8", "int8", "e5m2"):
    t0 = time.time()
    o, lse = pallas_fp8_attention(q, k, v, causal=True, mode="fused",
                                  fmt=fmt, block_q=BQ, block_k=BK)
    q8, k8, v8, sq, sk, sv, bq, bk, *_ = _prepare_fp8(q, k, v, BQ, BK, fmt)
    o_r, _ = reference_attention(
        _dequant_bf16(q8, sq, bq), _dequant_bf16(k8, sk, bk),
        _dequant_bf16(v8, sv, bk), causal=True)
    err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
    tol = 1.6e-2 if fmt == "e5m2" else 8e-3
    ok = err < tol
    print(f"lagged fused {fmt}: err={err:.2e} ({time.time()-t0:.0f}s) "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    fails += 0 if ok else 1
# sparse: block-diagonal-ish pattern
nt_q, nt_k = n // 512, n // 512
pat = np.zeros((nt_q, nt_k), bool)
for i in range(nt_q):
    pat[i, max(0, i - 1): i + 1] = True
t0 = time.time()
o_s, _ = pallas_sparse_attention(
    q, k, v, pattern=jnp.asarray(pat), causal=True,
    block_q=512, block_k=512,
)
mask = np.kron(pat, np.ones((512, 512), bool))
rows = np.arange(n)[:, None]; cols = np.arange(n)[None, :]
mask &= cols <= rows
o_r, _ = reference_attention(q, k, v, mask=jnp.asarray(mask[None, None]))
err = np.abs(np.asarray(o_s, np.float32) - np.asarray(o_r, np.float32)).max()
ok = err < 5e-2
print(f"lagged sparse: err={err:.2e} ({time.time()-t0:.0f}s) "
      f"{'OK' if ok else 'FAIL'}", flush=True)
fails += 0 if ok else 1
print("LAGGED-PORTS", "PASS" if fails == 0 else f"FAIL({fails})", flush=True)
PYEOF

# ---- 2. int8 fused: lagged vs not, in-process -------------------------------
step ab_int8_lagged 3000 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import json, os, statistics, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from flashattention_tpu.ops.pallas_fp8 import pallas_fp8_attention
b, h, n, d = 1, 8, 8192, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
def make(env_val):
    os.environ["FAT_FWD_LAGGED_MAX"] = env_val
    @jax.jit
    def loop(n_, q_, k_, v_):
        def body(i, acc):
            o, _ = pallas_fp8_attention(acc, k_, v_, mode="fused",
                                        fmt="int8")
            return o.astype(q_.dtype)
        return lax.fori_loop(0, n_, body, q_)
    out = loop(jnp.int32(2), q, k, v)
    _ = np.asarray(out).ravel()[:4]
    return loop
loop_off, loop_on = make("0"), make("1")
os.environ.pop("FAT_FWD_LAGGED_MAX", None)
def timed(loop, iters):
    t0 = time.perf_counter()
    _ = np.asarray(loop(jnp.int32(iters), q, k, v)).ravel()[:4]
    return time.perf_counter() - t0
i1, i2 = 30, 330
ratios = []
for p in range(4):
    toff = {i1: 1e9, i2: 1e9}; ton = {i1: 1e9, i2: 1e9}
    for _ in range(3):
        for it in (i1, i2):
            toff[it] = min(toff[it], timed(loop_off, it))
            ton[it] = min(ton[it], timed(loop_on, it))
    a = (toff[i2] - toff[i1]) / (i2 - i1) * 1e3
    bm = (ton[i2] - ton[i1]) / (i2 - i1) * 1e3
    fl = 4 * b * h * n * n * d
    print(json.dumps({"pair": p, "off_ms": round(a, 3),
                      "on_ms": round(bm, 3),
                      "on_over_off": round(bm / a, 4),
                      "off_tf": round(fl / a / 1e9, 1),
                      "on_tf": round(fl / bm / 1e9, 1)}), flush=True)
    ratios.append(bm / a)
    time.sleep(2)
med = statistics.median(ratios)
print(json.dumps({"metric": "ab_int8_fused_lagged",
                  "median_on_over_off": round(med, 4),
                  "verdict": "lagged faster" if med < 0.98 else
                             ("lagged slower" if med > 1.02 else "noise")}),
      flush=True)
PYEOF

echo "QUEUE13 DONE $(date +%H:%M:%S)"
