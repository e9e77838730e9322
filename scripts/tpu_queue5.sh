#!/bin/bash
# Round-3 sequential TPU queue.
#
# Differences from queue4 (VERDICT r2 items 1-8):
#  - Runs from a PINNED git worktree of the commit under test, so the main
#    tree stays editable while the queue drains.
#  - Logs land in the repo (benchmarks/results/queue5/), not /tmp — queue4's
#    evidence was wiped with /tmp between rounds (VERDICT r2 weak #4).
#  - verify_decode_merged adjudicates the 6.1e-5 merged-vs-flat delta with a
#    THREE-way comparison (flat/merged/fp32-gather-oracle): same distance
#    from the oracle == accumulation-order class, not a bug.
#  - Defaults under test: FAT_PAGED_MERGED=1 and FAT_FWD_SCALE_FOLD=1 are
#    now the shipped defaults; the A/Bs flip them OFF on side B.
#
# Usage: scripts/tpu_queue5.sh <sha> [max_wait_minutes]
set -u
REPO=/root/repo
SHA=${1:?usage: tpu_queue5.sh <sha> [max_wait_minutes]}
WT=/tmp/fat_q5_$SHA
LOGDIR=$REPO/benchmarks/results/queue5
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

MAX_POLLS=$(( ${2:-120} * 60 / 95 ))
n=0
until live; do
  n=$((n+1))
  echo "wedged poll $n/$MAX_POLLS $(date +%H:%M:%S)"
  [ "$n" -ge "$MAX_POLLS" ] && { echo "GAVE UP: still wedged"; exit 1; }
  sleep 20
done
echo "TPU LIVE $(date +%H:%M:%S)"

step() {  # step <name> <timeout_s> <cmd...>
  # Wait-until-live per step (bounded ~35 min) instead of queue4's 5-try
  # flicker loop — that loop is exactly how queue4 lost verify_softcap and
  # verify_sinks_chunked_prefill to a transient busy phase (VERDICT r2
  # weak #3): a wedge outlasting 5x45s cost the STEP, though the window
  # usually returned minutes later.
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

# ---- 1. adjudication + re-run of the two never-run verifies ----------------

step adjudicate_decode_merged 1500 python - <<'PYEOF'
# VERDICT r2 item 1: is the 6.1e-5 merged-vs-flat delta a bug or
# accumulation order? Three-way comparison at the queue4 shape: if flat and
# merged sit at the SAME distance from the fp32 gather oracle, neither is
# "more correct" — the delta is reduction-order rounding and the old
# 5e-5 merged-vs-flat assert was tighter than the kernels' own distance
# from truth. Runs bf16 AND fp8 cache (fp8 never ran past the old assert).
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
    f32 = lambda x: np.asarray(x, np.float32)
    d_mf = np.abs(f32(o_m) - f32(o_f)).max()
    d_fo = np.abs(f32(o_f) - f32(o_r)).max()
    d_mo = np.abs(f32(o_m) - f32(o_r)).max()
    print(f"quant={quant}: merged-vs-flat {d_mf:.3e}  flat-vs-oracle "
          f"{d_fo:.3e}  merged-vs-oracle {d_mo:.3e}", flush=True)
    # Accumulation-order verdict: merged must be no farther from the
    # oracle than ~2x flat's own distance (plus an absolute floor for
    # the exactly-equal case), and both must satisfy the bf16 contract.
    assert d_mo <= max(2.0 * d_fo, 1e-4), (quant, d_mo, d_fo)
    assert d_fo < 5e-2 and d_mo < 5e-2, (quant, d_fo, d_mo)
print("ADJUDICATION: accumulation-order class — PASS", flush=True)
PYEOF

step verify_softcap 1500 python - <<'PYEOF'
# softcap on REAL TPU: Mosaic tanh lowering legality + parity + a coarse
# cost check (exp2 taught us transcendentals can hit slow paths on v5e).
# Never ran in queue4 (liveness-flicker skip) — VERDICT r2 weak #3.
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
      f"(ratio {t_cap/t_plain:.2f} — >2x means Mosaic tanh slow path)",
      flush=True)
print("SOFTCAP PASS", flush=True)
PYEOF

step verify_sinks_chunked_prefill 1500 python - <<'PYEOF'
# Sinks + window with q_len > 1 (scalar-prefetch index-map path interpret
# mode cannot validate). Never ran in queue4 — VERDICT r2 weak #3.
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

# ---- 2. the two landed-default A/Bs (B side flips the default OFF) ---------
step ab_decode_merged 2400 python scripts/ab_compare.py --env-a FAT_PAGED_MERGED=1 --env-b FAT_PAGED_MERGED=0 --what decode,sol --pairs 2
step ab_fwd_scale_fold 2400 python scripts/ab_compare.py --env-a FAT_FWD_SCALE_FOLD=1 --env-b FAT_FWD_SCALE_FOLD=0 --what fwd,sol --pairs 2

# ---- 3. artifacts with the new defaults ------------------------------------
step bench_decode 1500 python scripts/bench_decode.py --out "$LOGDIR/../decode_r03.json"
step bench_fp8_bw 1500 python scripts/bench_fp8_bw.py --out "$LOGDIR/../fp8_bandwidth_r03.json"
step bench_serving 2400 python scripts/bench_serving.py
step mem_vs_dense 2400 python scripts/mem_vs_dense.py --out "$LOGDIR/../memory_r03.json"

# ---- 4. serving regression A/B vs the round-1 rev (VERDICT r2 weak #5) -----
step ab_serving_oldrev 3600 bash -c '
  set -u
  OLD=/tmp/fat_ab_f216024
  [ -d "$OLD" ] || git -C /root/repo worktree add --detach "$OLD" f216024
  for pair in 1 2; do
    echo "--- pair $pair NEW ($(date +%H:%M:%S))"
    (cd '"$WT"' && PYTHONPATH='"$WT"' timeout 900 python scripts/bench_serving.py --prefill-len 512 --prefill-chunk 256 >/tmp/srv_new_$pair.log 2>&1)
    grep serving_decode /tmp/srv_new_$pair.log || tail -3 /tmp/srv_new_$pair.log
    echo "--- pair $pair OLD f216024 ($(date +%H:%M:%S))"
    (cd "$OLD" && PYTHONPATH="$OLD" timeout 900 python scripts/bench_serving.py >/tmp/srv_old_$pair.log 2>&1)
    grep serving_decode /tmp/srv_old_$pair.log || tail -3 /tmp/srv_old_$pair.log
  done
'

# ---- 5. train MFU attribution + levers (VERDICT r2 item 7) -----------------
step bench_train_attrib 2400 python scripts/bench_train.py --attrib --out "$LOGDIR/../train_r03_full_remat.json"
step bench_train_noremat 1800 python scripts/bench_train.py --no-remat --out "$LOGDIR/../train_r03_noremat.json"
step bench_train_dots 1800 python scripts/bench_train.py --remat-policy dots --out "$LOGDIR/../train_r03_dots.json"

# ---- 6. forward VPU-roofline attribution (VERDICT r2 item 3 alt leg) -------
# Same-window ablation at the headline shape: mm_only isolates the 2-matmul
# MXU floor; prod - mm_only = the softmax's VPU serialization cost. If
# t_prod ~= t_mm_only + t_vpu(no_max/no_exp deltas), the forward's
# 0.82-of-SOL is the hardware bound, not scheduling.
step vpu_roofline 2400 bash -c '
  for m in prod mm_only no_max no_exp; do
    echo "--- $m ($(date +%H:%M:%S))"
    timeout 500 python scripts/ablate_fwd.py $m 512 1024
  done
'

# ---- 7. headline with the landed wins + fp8 leg ----------------------------
step bench_headline 1200 python bench.py

echo "QUEUE5 DONE $(date +%H:%M:%S)"
