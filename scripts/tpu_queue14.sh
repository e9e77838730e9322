#!/bin/bash
# Round-4 queue 14 — from-HEAD measurement pass after the defaults landed:
#   1. headline via the RETRYING bench.py (queue12's single-shot run landed
#      in a wedged window and recorded 0.0)
#   2. serving bench from HEAD: bf16 + int8 arms now include the in-place
#      sub-block append AND the int8-qk/pps4 decode defaults
#   3. decode default confirm: bf16 (default) vs int8 (default) — two arms,
#      no env overrides, the engine-user experience
#   4. int8-qk default TPU parity spot check vs the gather oracle
#
# Usage: scripts/tpu_queue14.sh <sha>
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue14.sh <sha>}
WT=/tmp/fat_q14_$SHA
LOGDIR=$REPO/benchmarks/results/queue14
mkdir -p "$LOGDIR"

# Sequencing: wait for queue12 AND queue13.
while pgrep -f "tpu_queue1[23].sh" >/dev/null 2>&1; do
  echo "waiting for queue12/13 ($(date +%H:%M:%S))"; sleep 120
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

# ---- 1. headline (bench.py retries through wedges internally) ---------------
step bench_headline_head 4200 python bench.py

# ---- 2. serving at HEAD (sub-block append + int8-qk defaults) ---------------
step bench_serving_bf16_head 2400 python scripts/bench_serving.py
step bench_serving_int8_head 2400 python scripts/bench_serving.py --quant int8

# ---- 3. decode defaults confirm (no env overrides) --------------------------
step decode_defaults_confirm 2400 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import json, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
b, h, d, seqlen, page = 64, 8, 128, 2048, 64
npg = seqlen // page
rng = np.random.default_rng(0)
pi = jnp.asarray((rng.permutation(b * npg) + 1).reshape(b, npg), jnp.int32)
lengths = jnp.full((b,), seqlen, jnp.int32)
q = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)
def arm(dtype, quantized):
    kp = jax.random.normal(jax.random.key(0), (h, b * npg + 1, page, d),
                           jnp.float32).astype(dtype)
    vp = jax.random.normal(jax.random.key(1), (h, b * npg + 1, page, d),
                           jnp.float32).astype(dtype)
    ks = vs = None
    if quantized:
        ks = jax.random.uniform(jax.random.key(3),
                                (h, b * npg + 1, page, 1), jnp.float32,
                                0.01, 0.02)
        vs = jax.random.uniform(jax.random.key(4),
                                (h, b * npg + 1, page, 1), jnp.float32,
                                0.01, 0.02)
    @jax.jit
    def loop(n_, q0):
        def body(i, qq):
            o = pallas_paged_attention(qq, kp, vp, pi, lengths,
                                       k_scales=ks, v_scales=vs)
            return o.astype(qq.dtype)
        return lax.fori_loop(0, n_, body, q0)
    _ = np.asarray(loop(jnp.int32(2), q)).ravel()[:4]
    return loop
arms = {"bf16-default": arm(jnp.bfloat16, False),
        "int8-default": arm(jnp.int8, True)}
def timed(loop, it):
    t0 = time.perf_counter()
    _ = np.asarray(loop(jnp.int32(it), q)).ravel()[:4]
    return time.perf_counter() - t0
i1, i2 = 20, 180
best = {k: {i1: 1e9, i2: 1e9} for k in arms}
for t in range(4):
    for it in (i1, i2):
        for k, loop in arms.items():
            best[k][it] = min(best[k][it], timed(loop, it))
    time.sleep(2)
out = {}
for k in arms:
    step_s = (best[k][i2] - best[k][i1]) / (i2 - i1)
    out[k] = {"step_ms": round(step_s * 1e3, 3),
              "tokens_per_s": round(b / step_s, 1)}
    print(json.dumps({k: out[k]}), flush=True)
win = out["int8-default"]["tokens_per_s"] / out["bf16-default"]["tokens_per_s"]
print(json.dumps({"metric": "decode_defaults_confirm",
                  "int8_over_bf16": round(win, 3),
                  "rows": out}), flush=True)
PYEOF

# ---- 3a. spec-engine bench rerun: queue12's run died at the bit-exact
# parity assert (spec-self vs plain diverged on TPU — chunk-verify vs
# q_len=1 decode kernels differ at bf16 accumulation class and random-init
# logits are near-flat). The bench now adjudicates each divergence with a
# teacher-forced fp32 dense forward (both tokens in top-2 AND margin <0.1
# = numeric tie; anything else still hard-fails).
step bench_spec_engine 3600 python scripts/bench_spec_engine.py \
  --gamma 4 --tokens 48 --batch 4 \
  --out "$REPO/benchmarks/results/spec_engine_r04.json"

# ---- 3b. donation alias check (VERDICT r3 item 2, the open sub-question):
# the engine decode jit donates the 8-layer cache list; the donate=True
# memdump row must show alias_mb ~= cache_total_mb and the ~2x
# one-layer-side defensive-copy temps gone. donate=False row is the
# caller-retains-caches lower bound (queue12 measured temp 235 vs 138 MB).
step serving_memdump_donate 2400 python scripts/serving_attrib.py \
  --variants full,scatter,noappend --memdump

# ---- 4. int8-qk default parity spot check -----------------------------------
step verify_int8_default 1200 python - <<'PYEOF'
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
b, h_kv, h_q, page, pps, d = 2, 2, 4, 16, 4, 128
maxlen = page * pps
lengths = jnp.asarray([maxlen, 23], jnp.int32)
pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
cache = init_paged_cache(h_kv, b * pps + 1, page, d, quant="int8")
ks = jax.random.normal(jax.random.key(0), (b, h_kv, maxlen, d))
vs = jax.random.normal(jax.random.key(1), (b, h_kv, maxlen, d))
cache = append_to_pages(cache, ks, vs, pi, jnp.zeros((b,), jnp.int32),
                        valid_len=lengths)
q = jax.random.normal(jax.random.key(9), (b, h_q, d), jnp.bfloat16)
o = pallas_paged_attention(q, cache.k_pages, cache.v_pages, pi, lengths,
                           k_scales=cache.k_scales, v_scales=cache.v_scales)
o_ref = paged_attention_decode(q.astype(jnp.float32), cache, pi, lengths)
err = np.abs(np.asarray(o, np.float32) - np.asarray(o_ref, np.float32)).max()
ok = err < 2.5e-2  # quant precision class (CLAUDE.md)
print(f"int8-qk default decode vs gather oracle: err={err:.3e} "
      f"{'OK' if ok else 'FAIL'}", flush=True)
print("INT8-DEFAULT", "PASS" if ok else "FAIL", flush=True)
PYEOF

echo "QUEUE14 DONE $(date +%H:%M:%S)"
