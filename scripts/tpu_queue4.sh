#!/bin/bash
# Sequential TPU work queue — run after (or across) a wedged-tunnel window.
#
# The axon tunnel serves ONE shared v5e and wedges hard for 45+ min at a
# time (CLAUDE.md); TPU work must be queued sequentially, never in
# parallel, and each step needs its own `timeout` so a wedge mid-queue
# costs one step, not the session. Steps are ordered cheapest-first so a
# short healthy window still retires the verification drives.
#
# Usage: scripts/tpu_queue4.sh [max_wait_minutes]   (default 120)
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/tpu_queue4_$(date +%H%M%S)
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

# ---- 1. wave-2 correctness verifies (TPU-only surfaces), cheapest first ----
step verify_bwd_opt 1200 python - <<'EOF'
# Round-2 backward optimizations on REAL TPU (interpret mode cannot
# validate Mosaic's block-revisit/flush semantics or compile legality):
#  - resident-dQ parks earlier sweeps at block 0 (was: dummy padding block)
#  - dK/dV/dQ leave the kernel in the INPUT dtype when groups==1
#  - softmax_scale folded into the q tile in all bwd kernels
# Checks: grads vs oracle at the headline shape (resident), at d=256
# (HBM-partials fallback), and under GQA (fp32 outs + group reduce).
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.reference import reference_attention

def check(tag, b, h, n, d, h_kv=None, causal=True, tol=2.5e-2):
    h_kv = h_kv or h
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h_kv, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h_kv, n, d), jnp.bfloat16)
    def loss_p(t):
        o, _ = pallas_attention(t[0], t[1], t[2], causal=causal)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    def loss_r(t):
        kk = jnp.repeat(t[1], h // h_kv, axis=1)
        vv = jnp.repeat(t[2], h // h_kv, axis=1)
        o, _ = reference_attention(t[0], kk, vv, causal=causal)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    gp = jax.grad(loss_p)((q, k, v))
    gr = jax.grad(loss_r)((q, k, v))
    worst = 0.0
    for name, a, bb in zip("dq dk dv".split(), gp, gr):
        m = float(np.abs(np.asarray(a, np.float32)
                         - np.asarray(bb, np.float32)).max())
        scale = max(1.0, float(np.abs(np.asarray(bb, np.float32)).max()))
        worst = max(worst, m / scale)
        print(f"{tag} {name}: max|d|={m:.3e} rel={m/scale:.3e}", flush=True)
    assert worst < tol, (tag, worst)

check("resident d128", 1, 4, 8192, 128)
check("fallback d256", 1, 2, 8192, 256)
check("gqa groups=4", 1, 8, 2048, 128, h_kv=2)
print("BWD-OPT PASS", flush=True)
EOF

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

step verify_softcap 1200 python - <<'PYEOF'
# softcap on REAL TPU: Mosaic tanh lowering legality + parity + a coarse
# cost check (exp2 taught us transcendentals can hit slow paths on v5e).
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
o, lse = pallas_attention(q, k, v, causal=True, softcap=10.0)
o_r, lse_r = reference_attention(q, k, v, causal=True, softcap=10.0)
err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
print(f"softcap fwd maxerr {err:.4f}", flush=True)
assert err < 5e-2, err
g = jax.grad(lambda t: jnp.sum(pallas_attention(
    t[0], t[1], t[2], causal=True, softcap=10.0)[0].astype(jnp.float32)**2)
)((q, k, v))
gs = [np.abs(np.asarray(x, np.float32)).max() for x in g]
print("softcap grads finite:", gs, flush=True)
assert all(np.isfinite(x) for x in gs)
def mk(cap):
    @jax.jit
    def loop(n_, q0):
        def body(i, acc):
            o, _ = pallas_attention(acc, k, v, causal=True, softcap=cap)
            return o.astype(acc.dtype)
        return lax.fori_loop(0, n_, body, q0)
    return loop
def tp(loop):
    best = 1e9
    loop(jnp.int32(2), q)
    for _ in range(3):
        for i1, i2 in ((10, 110),):
            t0=time.perf_counter(); np.asarray(loop(jnp.int32(10), q)).ravel()[:4]; a=time.perf_counter()-t0
            t0=time.perf_counter(); np.asarray(loop(jnp.int32(110), q)).ravel()[:4]; bb=time.perf_counter()-t0
            best=min(best,(bb-a)/100)
    return best
t_cap, t_plain = tp(mk(10.0)), tp(mk(None))
print(f"fwd {n=} softcap {t_cap*1e3:.3f} ms vs plain {t_plain*1e3:.3f} ms "
      f"(ratio {t_cap/t_plain:.2f} - >2x means Mosaic tanh slow path)",
      flush=True)
print("SOFTCAP PASS", flush=True)
PYEOF

step verify_alibi 900 python - <<'PYEOF'
# ALiBi in-kernel bias on REAL TPU: compile + parity vs dense-bias oracle.
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.api import alibi_slopes
from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.reference import reference_attention
b, h, n, d = 1, 4, 2048, 128
q = jax.random.normal(jax.random.key(0), (b, h, n, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, n, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, n, d), jnp.bfloat16)
sl = alibi_slopes(h)
o, _ = pallas_attention(q, k, v, causal=True, alibi_slopes=sl)
rows = jnp.arange(n)[:, None]; cols = jnp.arange(n)[None, :]
bias = -sl[:, None, None] * jnp.abs(cols - rows).astype(jnp.float32)
o_r, _ = reference_attention(q, k, v, causal=True, bias=bias)
err = np.abs(np.asarray(o, np.float32) - np.asarray(o_r, np.float32)).max()
print(f"alibi fwd maxerr {err:.4f}", flush=True)
assert err < 5e-2, err
g = jax.grad(lambda t: jnp.sum(pallas_attention(
    t[0], t[1], t[2], causal=True, alibi_slopes=sl)[0].astype(jnp.float32)**2)
)((q, k, v))
assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
print("ALIBI PASS", flush=True)
PYEOF

step verify_paged_sinks 1200 python - <<'PYEOF'
# StreamingLLM sinks on the paged path, REAL TPU: sink+band walk compile
# legality (the per-chunk slot select is new Mosaic surface) + parity.
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)
b, h, d, psize, total, window, sinks = 4, 8, 128, 64, 2048, 512, 128
npg = total // psize
cache = init_paged_cache(h, b * npg + 1, psize, d, dtype=jnp.bfloat16)
kf = jax.random.normal(jax.random.key(0), (b, h, total, d), jnp.bfloat16)
vf = jax.random.normal(jax.random.key(1), (b, h, total, d), jnp.bfloat16)
pi = jnp.arange(b * npg).reshape(b, -1).astype(jnp.int32)
lengths = jnp.full((b,), total, jnp.int32)
cache = append_to_pages(cache, kf, vf, pi, jnp.zeros((b,), jnp.int32))
q = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)
o_ref = paged_attention_decode(q, cache, pi, lengths, window=window,
                               sinks=sinks)
for merged in (False, True):
    o = pallas_paged_attention(q, cache.k_pages, cache.v_pages, pi, lengths,
                               window=window, sinks=sinks,
                               compute_dtype=jnp.float32, merged=merged)
    err = np.abs(np.asarray(o, np.float32) - np.asarray(o_ref, np.float32)).max()
    print(f"merged={merged}: maxerr {err:.3e}", flush=True)
    assert err < 5e-2, err
print("PAGED-SINKS PASS", flush=True)
PYEOF

step verify_paged_window_reclaim 1200 python - <<'EOF'
# Sliding-window paged decode with a FREED-PREFIX page row (the engine's
# O(window) page reclamation layout): pages below the band hold the dump
# page and must never be read; parity vs the full table and the gather
# oracle, plus windowed-vs-full decode speedup. TPU-compile-only path.
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)
b, h, d, psize, total, window = 4, 8, 128, 256, 4096, 512
npg = total // psize
cache = init_paged_cache(h, b * npg + 1, psize, d, dtype=jnp.bfloat16)
dump = b * npg
kf = jax.random.normal(jax.random.key(0), (b, h, total, d), jnp.bfloat16)
vf = jax.random.normal(jax.random.key(1), (b, h, total, d), jnp.bfloat16)
pi = jnp.arange(b * npg).reshape(b, -1).astype(jnp.int32)
lengths = jnp.full((b,), total, jnp.int32)
cache = append_to_pages(cache, kf, vf, pi, jnp.zeros((b,), jnp.int32))
q = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)
first_needed = (total - window + 1) // psize
pif = np.asarray(pi).copy(); pif[:, :first_needed] = dump
pif = jnp.asarray(pif)
o_full = pallas_paged_attention(q, cache.k_pages, cache.v_pages, pi,
                                lengths, window=window,
                                compute_dtype=jnp.float32)
o_free = pallas_paged_attention(q, cache.k_pages, cache.v_pages, pif,
                                lengths, window=window,
                                compute_dtype=jnp.float32)
o_ref = paged_attention_decode(q, cache, pi, lengths, window=window)
d1 = np.abs(np.asarray(o_free, np.float32) - np.asarray(o_full, np.float32)).max()
d2 = np.abs(np.asarray(o_free, np.float32) - np.asarray(o_ref, np.float32)).max()
print(f"freed-prefix vs full: {d1:.3e}  vs oracle: {d2:.3e}", flush=True)
assert d1 == 0.0, "kernel read a reclaimed (dump) page!"
assert d2 < 5e-2, d2
def mkloop(window_):
    @jax.jit
    def loop(n_, q0):
        def body(i, acc):
            o = pallas_paged_attention(acc, cache.k_pages, cache.v_pages,
                                       pif if window_ else pi, lengths,
                                       window=window_)
            return o.astype(acc.dtype)
        return lax.fori_loop(0, n_, body, q0)
    return loop
def tp(loop, i1, i2):
    best = {i1: 1e9, i2: 1e9}
    for _ in range(3):
        for it in (i1, i2):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.int32(it), q)).ravel()[:8]
            best[it] = min(best[it], time.perf_counter() - t0)
    return (best[i2] - best[i1]) / (i2 - i1)
lw, lf = mkloop(window), mkloop(None)
lw(jnp.int32(2), q); lf(jnp.int32(2), q)
t_w, t_f = tp(lw, 50, 1050), tp(lf, 50, 1050)
print(f"decode window={window} {t_w*1e6:.0f} us vs full-4K {t_f*1e6:.0f} us "
      f"(speedup {t_f/t_w:.2f}x, ideal ~{total/window:.1f}x at line rate)",
      flush=True)
print("PAGED-WINDOW PASS", flush=True)
EOF

step verify_decode_merged 1200 python - <<'PYEOF'
# Merged decode schedule on REAL TPU: compile legality + parity vs the flat
# kernel and the gather oracle at the decode_r02 shape (bf16 + fp8 cache).
from flashattention_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.serving.paged_kv import (
    init_paged_cache, append_to_pages, paged_attention_decode,
)
for quant in (None, "fp8"):
    b, h, d, psize, total = 8, 8, 128, 64, 1024
    npg = total // psize
    cache = init_paged_cache(h, b * npg + 1, psize, d, quant=quant,
                             dtype=jnp.bfloat16)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d), jnp.bfloat16)
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d), jnp.bfloat16)
    pi = jnp.arange(b * npg).reshape(b, -1).astype(jnp.int32)
    lengths = jnp.asarray([total] * (b - 1) + [37], jnp.int32)
    cache = append_to_pages(cache, kf, vf, pi, jnp.zeros((b,), jnp.int32),
                            valid_len=lengths)
    q = jax.random.normal(jax.random.key(2), (b, h, d), jnp.bfloat16)
    kw = dict(k_scales=cache.k_scales, v_scales=cache.v_scales,
              compute_dtype=jnp.float32)
    o_f = pallas_paged_attention(q, cache.k_pages, cache.v_pages, pi,
                                 lengths, merged=False, **kw)
    o_m = pallas_paged_attention(q, cache.k_pages, cache.v_pages, pi,
                                 lengths, merged=True, **kw)
    o_r = paged_attention_decode(q, cache, pi, jnp.maximum(lengths, 1))
    d1 = np.abs(np.asarray(o_m, np.float32) - np.asarray(o_f, np.float32)).max()
    d2 = np.abs(np.asarray(o_m, np.float32) - np.asarray(o_r, np.float32)).max()
    print(f"quant={quant}: merged-vs-flat {d1:.3e}  vs-oracle {d2:.3e}",
          flush=True)
    assert d1 < 5e-5, d1
    assert d2 < 5e-2, d2
print("DECODE-MERGED PASS", flush=True)
PYEOF


# ---- 2. benches -------------------------------------------------------------
step bench_decode 1200 python scripts/bench_decode.py
step bench_serving 1800 python scripts/bench_serving.py
step bench_train 1800 python scripts/bench_train.py
step bench_spec 1800 python scripts/bench_spec.py

# ---- 3. same-window A/Bs (longest last; fine if the wall clock cuts them) ---
step ab_bwd_stages 1800 python scripts/ab_compare.py --env-b FAT_BWD_STAGES=1 --what bwd,sol --pairs 2
step ab_decode_merged 2400 python scripts/ab_compare.py --env-b FAT_PAGED_MERGED=1 --what decode,sol --pairs 2
step ab_fwd_scale_fold 2400 python scripts/ab_compare.py --env-b FAT_FWD_SCALE_FOLD=1 --what fwd,sol --pairs 2
step ab_bwd_oldnew 3600 python scripts/ab_compare.py --rev "${AB_OLD_REV:-5cc841f}" --what bwd,sol --pairs 2

echo "QUEUE4 DONE $(date +%H:%M:%S)"
