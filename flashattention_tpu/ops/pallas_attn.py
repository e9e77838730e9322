"""Pallas TPU flash-attention kernels (forward + backward).

The TPU-native kernel path — replaces the reference's Triton kernels
(src/fa{1,2,3}/triton/kernels_{fwd,bwd}.py) and its "CUDA" host loops
(csrc/fa{1,2,3}/*.cu). Design deltas from the reference, all deliberate:

- One kernel family, FA2-schedule (deferred normalization, single divide at
  the end — the reference's FA2 divides twice, bug B2 in SURVEY.md §2.6).
- Output is stored in the input dtype (the reference's Triton kernels force
  fp16, quirk Q2).
- softmax_scale is applied inside the kernel (the reference's FA2 Triton
  kernel drops it, bug B4).
- Backward is split into a dKV kernel (grid over KV tiles, loop over Q tiles)
  and a dQ kernel (grid over Q tiles, loop over KV tiles) — no atomics, which
  do not exist on TPU (the reference uses fp16 ``tl.atomic_add`` for dQ,
  src/fa1/triton/kernels_bwd.py:89).
- Causal masking: whole KV tiles above the diagonal are skipped
  (reference ``causal_block_skip``, src/common/mask.py:3-5), and the in-tile
  mask is built from absolute indices with a ``k_len - q_len`` offset so
  decode (q_len != k_len) works (reference look_ahead_mask_,
  src/fa3/torch/flashattention_pytorch.py:176-190).
- GQA: K/V may carry fewer heads than Q (H % H_kv == 0); the KV block specs
  map query head h to KV head h // group, so grouped heads share the streamed
  K/V tiles with zero extra HBM traffic (new scope vs. the reference's
  MHA-only layout).
- Attention dropout (reference L6's _block_sparse_flash_attention dropout,
  flashattention_pytorch.py:149-156) is generated *counter-based*: a murmur3
  hash of (batch·head, absolute row, absolute col, seed) — the backward
  regenerates the identical mask from indices instead of saving O(N²/bc) mask
  tensors (the reference stashes mask lists on the autograd ctx, ln 294-308).

Grids iterate (batch, head, tiles...) with
``dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")`` so
the batch/head/Q dims spread across TPU megacores while the KV dim runs the
online-softmax reduction sequentially.
"""

from __future__ import annotations

import contextvars
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE
from flashattention_tpu.ops.specs import MIN_BLOCK

LANES = 128  # lane width for fp32 m/l scratch rows
# Backward strategy default: FUSED (dK/dV in scratch + dQ partials reduced
# in XLA; 5 matmul passes vs the split pair's 7). Round-1's "split wins
# 1.35x" A/B was invalid — its timing loop carried only dq, so XLA
# dead-code-eliminated the split path's dKV kernel entirely. Re-measured
# 2026-08-17 with all three grads consumed and overhead-corrected timing:
# fused 6.21 ms vs split 7.40 ms at N=8K d=128 (RESULTS.md round-2 table).
_BWD_IMPL = os.environ.get("FAT_BWD_IMPL", "fused")  # "split" | "fused"
# Backward K/V-stream pipeline depth, the bwd analogue of the forward's
# ``stages`` knob (PARITY C7: the reference plumbs ``stages`` but never uses
# it). 2 = Mosaic's default double buffering; 1 = single-buffer the
# Q-streamed inputs (q/do), halving their VMEM so larger blocks fit.
_BWD_STAGES = int(os.environ.get("FAT_BWD_STAGES", "2"))
# Forward softmax-scale placement: 1 folds the scale into the q tile
# (saves one VPU plane per tile; costs ~4e-3 bf16 LSE drift vs the
# reference's 1e-3 LSE contract). See _fwd_kernel note.
_FWD_SCALE_FOLD = os.environ.get("FAT_FWD_SCALE_FOLD", "1") == "1"
# Lagged-max forward frame — DEFAULT ON since round 4: the in-process
# interleaved A/B (queue11/ab_lagged_inproc.log, 4 pairs, per-pair SOL
# brackets) measured median B/A = 0.884 (11.6% faster forward, every pair
# in lagged's favor, 152-164 TF vs 135-153). This supersedes queue9's
# subprocess A/B, which was confounded by a systematic per-process SOL
# split. See _fwd_kernel's lagged branch and RESULTS.md "VPU roofline".
_FWD_LAGGED_MAX = os.environ.get("FAT_FWD_LAGGED_MAX", "1") == "1"


def _lagged_env() -> bool:
    """Trace-time read of the lagged-max knob — ONE definition shared by
    the bf16, fused-fp8/int8, and block-sparse forward kernels so A/B
    harnesses flipping FAT_FWD_LAGGED_MAX flip all three together
    (import-time default: _FWD_LAGGED_MAX)."""
    return os.environ.get(
        "FAT_FWD_LAGGED_MAX", "1" if _FWD_LAGGED_MAX else "0"
    ) == "1"


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _causal_should_run(iq, ik, block_q, block_k, offset, window=None,
                       sinks=0):
    """True unless the whole (iq, ik) tile is outside the attended band.

    Query row r attends to cols <= r + offset (offset = n_k - n_q), and —
    with a sliding ``window`` W — only to cols > r + offset - W (the last W
    keys including self) plus, with ``sinks`` S > 0, the first S columns
    (StreamingLLM attention sinks). Tiles entirely above the diagonal OR
    entirely below the window band (and past the sinks) are skipped; with
    W << N the kernel runs O(N*(W+S)) tiles instead of O(N^2/2).
    """
    run = (iq * block_q + block_q - 1 + offset) >= ik * block_k
    if window is not None:
        # Tile's most permissive row for the low bound is its FIRST:
        # its lowest attended col is iq*bq + offset - W + 1.
        in_band = (
            (ik * block_k + block_k - 1) >= (iq * block_q + offset - window + 1)
        )
        if sinks:
            in_band = in_band | (ik * block_k < sinks)
        run = run & in_band
    return run


def _causal_needs_mask(iq, ik, block_q, block_k, offset, window=None,
                       sinks=0):
    """True when the (iq, ik) tile straddles the diagonal (its last column can
    exceed what the tile's *first* row may attend to) or — with a sliding
    window — the band's low edge. Tiles fully inside the band take the
    unmasked fast path — this is the main VPU saving for causal attention
    (the per-element where/iota work is O(N^2))."""
    needs = (ik * block_k + block_k - 1) > (iq * block_q + offset)
    if window is not None:
        # First col <= last row's low bound -> some element below the band.
        # With sinks the below-band element only masks when it is PAST the
        # sink columns (a tile wholly inside the sinks stays unmasked).
        below = ik * block_k <= (iq * block_q + block_q - 1 + offset - window)
        if sinks:
            below = below & ((ik * block_k + block_k - 1) >= sinks)
        needs = needs | below
    return needs


def _tile_mask(iq, ik, block_q, block_k, n_q, n_k, causal, offset,
               window=None, sinks=0):
    """Boolean (block_q, block_k) mask from absolute indices.

    Built from a (bq, 1) row iota and a (1, bk) col iota so the compare
    broadcasts directly — one VPU pass instead of materializing two full
    (bq, bk) int32 index planes."""
    rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    if causal:
        mask = cols <= rows + offset
        if window is not None:
            band = cols > rows + offset - window
            if sinks:
                band = band | (cols < sinks)
            mask = mask & band
        if n_k % block_k:
            mask = mask & (cols < n_k)
        return mask
    return jnp.broadcast_to(cols < n_k, (block_q, block_k))


# Segment-id padding sentinels. Distinct values on the q and kv side so a
# padded q row can never match a padded kv col (and neither matches real
# ids, which must be >= 0).
_SEG_PAD_Q = -2147483647
_SEG_PAD_K = -2147483646


def _unpack_refs(refs, dropout_rate, segmented, alibi=False):
    """Shared kernel-ref unpacking:
    [qoff, (seed), (qseg, kseg), (slopes), *rest] — the optional groups
    mirror the args/in_specs assembly in _flash_fwd / _flash_bwd."""
    refs = list(refs)
    qoff_ref = refs.pop(0)
    seed_ref = refs.pop(0) if dropout_rate > 0.0 else None
    if segmented:
        qseg_ref = refs.pop(0)
        kseg_ref = refs.pop(0)
    else:
        qseg_ref = kseg_ref = None
    slopes_ref = refs.pop(0) if alibi else None
    return qoff_ref, seed_ref, qseg_ref, kseg_ref, slopes_ref, refs


def _mosaic_tanh(x):
    """tanh for in-kernel use, via natural exp:
    tanh(x) = 1 - 2 / (exp(2x) + 1).

    History: softcap measured 3.52x WHOLE-KERNEL forward cost at N=4K with
    jnp.tanh; this exp-form rewrite was landed on the hypothesis of a
    Mosaic tanh-lowering slow path, but re-measurement AT this rev reads
    3.49x (benchmarks/results/queue5/verify_softcap.log) — the cost is the
    VPU arithmetic chain itself (exp + divide + muls per score element on
    top of the softmax's own ops), not the lowering. Attribution and
    cheaper-chain candidates: scripts/vpu_microbench.py.
    Stable at both tails: exp(2x) -> inf gives 1 - 0 = 1; exp(2x) -> 0
    gives 1 - 2 = -1. fp32 relative error vs jnp.tanh ~1e-7."""
    return 1.0 - 2.0 / (jnp.exp(2.0 * x) + 1.0)


# Odd-polynomial tanh (clamped at |x| = 3.5): degree-8 least-squares fit of
# tanh(x)/x in x^2 on a Chebyshev-clustered [0, 3.5] grid; max abs error
# 9.9e-4 over all of R (the clamp step at 3.5 contributes 1.5e-3 - fit
# residual). For softcap the capped-score error is cap * 1e-3 — inside the
# bf16 kernels' tolerance class. No divide, no exp: 8 FMAs + clamp + mul.
_TANH_POLY = (
    0.999807450335137, -0.32777769142457064, 0.11592520551627093,
    -0.03222164234475877, 0.006222740533094912, -0.0007806413241847445,
    5.9969083131884095e-05, -2.5485675382462395e-06, 4.5755599058353884e-08,
)


_SOFTCAP_INTERPRET = contextvars.ContextVar(
    "_fat_softcap_interpret", default=False
)


def _softcap_launch(call, interpret, *args):
    """Invoke a built ``pl.pallas_call`` with ``_SOFTCAP_INTERPRET`` bound
    to this launch's ``interpret`` flag. Kernel tracing happens inside this
    dynamic extent, so ``_softcap_tanh``'s default-impl pick can see
    interpret=True even on a TPU-backend process (interpret's emulation of
    the approx reciprocal is ~6x coarser than hardware — docstring there);
    kernels are module-level functions, so the flag can't ride a closure."""
    tok = _SOFTCAP_INTERPRET.set(bool(interpret))
    try:
        return call(*args)
    finally:
        _SOFTCAP_INTERPRET.reset(tok)


def _softcap_tanh(x):
    """tanh used by the softcap chain — implementation picked at TRACE
    time via FAT_SOFTCAP_IMPL (softcap measured 1.73-1.9x whole-kernel
    forward with the exp-form chain — queue11 + the queue18 triple
    control):

      - "recip" (DEFAULT on real TPU since round 5): exp +
        pl.reciprocal(approx=True) — the fast VPU reciprocal replaces
        the exact divide, which the A/B shows is the chain's expensive
        op: softcap overhead drops to median 1.24x
        (queue18b/ab_softcap_recip; TPU parity vs the capped oracle
        7.8e-3 = the same bf16 class as exp).
      - "exp" (default under interpret/CPU — including interpret=True on
        a TPU-backend process, seen via _SOFTCAP_INTERPRET): _mosaic_tanh
        — exp + exact divide, error ~1e-7. Interpret's emulation of the
        approx reciprocal is far coarser than the hardware (4.8e-2 vs
        7.8e-3 output class), so the interpret exactness gate keeps the
        exact chain; this is the same backend-precision split the
        fp32-matmul notes document. An explicit FAT_SOFTCAP_IMPL is
        honored anywhere (the A/B harnesses set it deliberately).
      - "poly": clamped odd polynomial (_TANH_POLY) — no exp, no divide;
        error <= 1e-3 absolute, but MEASURED SLOWER than the exp chain
        (median 2.10x, queue18b — 8 serial FMAs beat a divide on latency
        but lose on the VPU's issue width).
    """
    default = (
        "recip"
        if jax.default_backend() == "tpu" and not _SOFTCAP_INTERPRET.get()
        else "exp"
    )
    impl = os.environ.get("FAT_SOFTCAP_IMPL", default)
    if impl == "poly":
        xc = jnp.clip(x, -3.5, 3.5)
        x2 = xc * xc
        p = jnp.float32(_TANH_POLY[-1])
        for c in _TANH_POLY[-2::-1]:
            p = p * x2 + jnp.float32(c)
        return xc * p
    if impl == "recip" and hasattr(pl, "reciprocal"):
        return 1.0 - 2.0 * pl.reciprocal(
            jnp.exp(2.0 * x) + 1.0, approx=True
        )
    return _mosaic_tanh(x)


def _alibi_tile_bias(slopes_ref, ih, iq, ik, block_q, block_k, offset):
    """ALiBi bias for tile (iq, ik) of query head ``ih``:
    -slope_h * |key_pos(col) - key_pos(row)| — computed from positions
    in-kernel (no HBM bias operand; flash-attn streams a materialized
    bias, a GPU-ism). Row r of the q tile sits at key-timeline position
    iq*block_q + r + offset; the |.| form covers non-causal too and
    equals slope*(col - row-line) on the causal side."""
    rows = iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    ) + offset
    cols = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    dist = jnp.abs(cols - rows).astype(jnp.float32)
    return -slopes_ref[ih] * dist


def _bwd_scores(q, k, *, alibi, slopes_ref, ih, softcap, use_mask,
                segmented, qseg_ref, kseg_ref, iq, ik, block_q, block_k,
                n_q, n_k, causal, offset, window, sinks=0):
    """Recomputed pre-exp scores for one backward tile — the scale-folded
    QK^T plus ALiBi bias, soft-cap, and the tile mask, shared by all three
    backward kernels (one definition, not four divergent copies).

    Returns (s2, mask, dcap): ``dcap`` is the d(capped)/d(raw) chain
    factor for the dq/dk path (None without softcap; dV never needs it —
    the value path skips the tanh).
    """
    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if alibi:
        s2 = s2 + _alibi_tile_bias(slopes_ref, ih, iq, ik, block_q,
                                   block_k, offset)
    dcap = None
    if softcap is not None:
        # d(cap*tanh(x/cap))/dx = 1 - tanh^2 (with the poly/recip impls
        # the derivative is evaluated at the approximated tanh — error
        # within the impl's documented bound, _softcap_tanh)
        tcap = _softcap_tanh(s2 * jnp.float32(1.0 / softcap))
        s2 = jnp.float32(softcap) * tcap
        dcap = 1.0 - tcap * tcap
    mask = _combined_mask(use_mask, segmented, qseg_ref, kseg_ref,
                          iq, ik, block_q, block_k, n_q, n_k, causal,
                          offset, window, sinks)
    if mask is not None:
        s2 = jnp.where(mask, s2, DEFAULT_MASK_VALUE)
    return s2, mask, dcap


def _seg_tile_mask(qseg_ref, kseg_ref, block_k):
    """Boolean (block_q, block_k) segment mask: attend iff ids are equal.

    Layouts follow the Mosaic-legal pattern of JAX's stock TPU flash
    attention: q ids ride lane-replicated as (1, block_q, LANES) blocks
    (tiled up to block_k — every lane holds the same id, so the tile IS
    the row broadcast), kv ids as (1, 1, block_k) blocks usable directly
    as the column vector. No size-1 lane dims anywhere (Mosaic cannot
    DMA/slice those — see CLAUDE.md).
    """
    qs = qseg_ref[0]          # (block_q, LANES), all lanes identical
    ks = kseg_ref[0]          # (1, block_k)
    return jnp.tile(qs, (1, block_k // LANES)) == ks


def _combined_mask(use_mask, segmented, qseg_ref, kseg_ref, iq, ik,
                   block_q, block_k, n_q, n_k, causal, offset, window,
                   sinks=0):
    """The tile's attend-mask, or None when the tile needs none (fast path).

    ``use_mask`` is the *static* causal/edge predicate from the dispatch;
    the segment mask (dynamic ids) applies on top on every tile when
    segments are present.
    """
    mask = None
    if use_mask:
        mask = _tile_mask(iq, ik, block_q, block_k, n_q, n_k, causal,
                          offset, window, sinks)
    if segmented:
        seg = _seg_tile_mask(qseg_ref, kseg_ref, block_k)
        mask = seg if mask is None else mask & seg
    return mask


def _keep_mask(seed, bh, iq, ik, block_q, block_k, rate):
    """Counter-based dropout keep mask for tile (iq, ik) of batch·head ``bh``.

    murmur3 finalizer over a per-element counter; deterministic in
    (seed, bh, absolute element index) so the backward kernels regenerate the
    exact forward mask with no saved state (O(1) RNG memory vs. the
    reference's saved mask lists, flashattention_pytorch.py:294-308).
    """
    rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    # Mix row and col through separate odd multipliers — a flat row*N+col
    # counter wraps int32 beyond 2^31 elements (~46K x 46K) and would repeat
    # mask rows with period 2^32/N at long context.
    x = (
        rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + seed.astype(jnp.uint32)
        + bh.astype(jnp.uint32) * jnp.uint32(2654435761)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    # keep with probability 1 - rate
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return x >= threshold


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    *refs,
    softmax_scale, causal, n_q, n_k, block_q, block_k, dropout_rate,
    window=None, segmented=False, softcap=None, alibi=False, sinks=0,
):
    qoff_ref, seed_ref, qseg_ref, kseg_ref, slopes_ref, rest = _unpack_refs(
        refs, dropout_rate, segmented, alibi
    )
    (q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv_tiles = pl.num_programs(3)
    # Absolute key-timeline position of query row 0 (ring/CP shards pass
    # their shard offset; default n_k - n_q = bottom-aligned/decode). A
    # runtime SMEM scalar so sharded callers can pass a traced offset.
    offset = qoff_ref[0]
    kv_edge = n_k % block_k != 0  # static

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Lagged-max is SOUND only while one tile's rowmax cannot exceed the
    # previous running max by >= 60 (the clamp that stops exp overflow;
    # see the lagged branch note). ALiBi breaks that bound STRUCTURALLY:
    # for causal+alibi each successive KV tile's best column is nearer
    # the diagonal, so the rowmax climbs by slope * block_k per tile
    # (256 at slope 0.5, block 1024 — H=8's steepest standard slope) and
    # the clamp corrupts p (measured 3.9 abs error at N=1000; round-5
    # find — shallow-slope tests never tripped it). Softcap bounds
    # |s| <= cap, so the climb is <= 2*cap: safe iff cap <= 30.
    lagged_env = _lagged_env() and not alibi and (
        softcap is None or softcap <= 30.0
    )

    # Sub-tile interleave (FAT_FWD_SUBTILES, round 5 — the d=64 lever):
    # process the (block_q, block_k) tile as `subs` sequential online-
    # softmax sub-updates over block_k/subs-wide K/V slices. Sub-update
    # si+1's QK^T matmul is data-independent of sub-update si's softmax
    # chain, so Mosaic can co-issue the next slice's MXU work with the
    # current slice's VPU work. At d=128 the VPU chain is ~37% of MXU
    # time and this measured within noise (round 2, CLAUDE.md); at d=64
    # both matmuls run at ~half MXU rate while the per-element VPU chain
    # is unchanged (~2x relative) — the serialization is the measured
    # ~45%-of-ceiling gap (RESULTS.md r5 d=64 cost model). Gated off
    # under segments (kseg block layout is per-tile) and dropout (the
    # keep-mask counter keys on full-tile indices shared with the bwd).
    subs = int(os.environ.get("FAT_FWD_SUBTILES", "1"))
    if (segmented or dropout_rate > 0.0 or subs < 2
            or block_k % subs or (block_k // subs) % LANES):
        subs = 1

    def _update(use_mask, lagged_tile=False):
        if subs == 1:
            _sub_update(use_mask, lagged_tile, k_ref[0, 0], v_ref[0, 0],
                        ik, block_k)
            return
        sub_k = block_k // subs
        for si in range(subs):
            _sub_update(
                use_mask,
                lagged_tile or si > 0,
                k_ref[0, 0, si * sub_k:(si + 1) * sub_k, :],
                v_ref[0, 0, si * sub_k:(si + 1) * sub_k, :],
                ik * subs + si,
                sub_k,
            )

    def _sub_update(use_mask, lagged_tile, k, v, eff_ik, eff_bk):
        # NOTE: exp2-domain softmax was tried and reverted — Mosaic lowers
        # jnp.exp2 through a slow path on v5e (5-8x whole-kernel regression,
        # measured 2026-08-16). Natural exp it is.
        # FAT_FWD_SCALE_FOLD=1 folds softmax_scale into the q TILE (bq x d
        # multiplies) instead of the s plane (bq x bk) — saves ~1 VPU plane
        # per tile but rounds q*scale in bf16, drifting the LSE ~4e-3.
        # DEFAULT ON since round 3: same-window A/B measured +4.5-5.3%
        # forward in both pairs (RESULTS.md). The LSE contract is internal
        # (the reference's fp16 kernels are far looser) and was relaxed to
        # 5e-3 (utils/testing.LSE_TOL); output tolerance is unchanged. The
        # backward always folds — its tolerances are grad-class.
        scale_fold = (
            os.environ.get("FAT_FWD_SCALE_FOLD", "1" if _FWD_SCALE_FOLD
                           else "0") == "1"
        )
        if scale_fold:
            q = q_ref[0, 0] * softmax_scale
        else:
            q = q_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if not scale_fold:
            s = s * jnp.float32(softmax_scale)
        if alibi:
            s = s + _alibi_tile_bias(slopes_ref, ih, iq, eff_ik, block_q,
                                     eff_bk, offset)
        if softcap is not None:
            # Logit soft-capping (Gemma-2 / flash-attn softcap): bound the
            # scaled scores BEFORE masking — tanh saturates the mask value.
            s = jnp.float32(softcap) * _softcap_tanh(
                s * jnp.float32(1.0 / softcap)
            )
        mask = _combined_mask(use_mask, segmented, qseg_ref, kseg_ref,
                              iq, eff_ik, block_q, eff_bk, n_q, n_k, causal,
                              offset, window, sinks)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        if lagged_env and lagged_tile:
            # Lagged-max frame (VPU-roofline finding, RESULTS.md r3): the
            # standard online softmax serializes MXU(s) -> rowmax reduce ->
            # exp -> MXU(p@v). Computing p in the frame of the running max
            # over PREVIOUS tiles removes the reduce from p's critical
            # path — rowmax/l-sum/rebase co-issue with the p@v matmul.
            # Mathematically identical (the frame cancels in o = acc/l and
            # rebases into lse); fp-wise the rescaling rounds in a
            # different order, same class as the standard alpha rescale.
            # The first VISITED tile always takes the standard path (see
            # the dispatch below), so the frame here is normally a true
            # running rowmax. The frame must still be FINITE (an -inf
            # frame makes p saturate and the rebase multiply by exp(-inf)
            # zeroes the tile): rows whose first valid key appears late
            # (segment packing) can still carry init -inf or
            # DEFAULT_MASK_VALUE (< -1e30 both — real |scores| can't reach
            # 1e30 from finite bf16 activations) and fall back to frame 0.
            # The +60 clamp bounds p <= e^60 for ANY input: exact whenever
            # one tile's rowmax exceeds the previous running max by < 60
            # (everything non-degenerate); beyond that the saturated
            # entries share weight (the softmax is a near-argmax there
            # anyway) instead of overflowing to NaN.
            frame = jnp.where(m_prev < -1e30, 0.0, m_prev)
            p = jnp.exp(jnp.minimum(s - frame[:, :1], 60.0))
            if mask is not None:
                p = jnp.where(mask, p, 0.0)
            sum_p = jnp.sum(p, axis=1, keepdims=True)  # l uses PRE-dropout p
            if dropout_rate > 0.0:
                bh = ib * pl.num_programs(1) + ih
                keep = _keep_mask(
                    seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
                )
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
            acc_mid = acc_scr[...] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            m_curr = jnp.max(s, axis=1, keepdims=True)   # off p's path
            m_next = jnp.maximum(m_prev, m_curr)
            # Clamped like p's exponent: m_next can sit at
            # DEFAULT_MASK_VALUE (all-masked row) or far below the frame
            # (all-underflowed tile, l there already 0) — an unclamped
            # exp overflows to inf and 0*inf poisons l with NaN.
            alpha = jnp.exp(jnp.minimum(frame - m_next, 60.0))
            l_scr[...] = (l_prev + sum_p) * alpha
            acc_scr[...] = acc_mid * alpha[:, :1]
            m_scr[...] = m_next
            return

        m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)        # (bq, LANES)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        if mask is not None:
            # Zero masked entries exactly: a row with NO valid keys has
            # m == DEFAULT_MASK_VALUE and p == 1 everywhere otherwise,
            # yielding a bogus uniform average instead of 0.
            p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        if dropout_rate > 0.0:
            bh = ib * pl.num_programs(1) + ih
            keep = _keep_mask(
                seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
            )
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)

        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    if causal:
        run = _causal_should_run(iq, ik, block_q, block_k, offset, window,
                                 sinks)
        needs_mask = _causal_needs_mask(
            iq, ik, block_q, block_k, offset, window, sinks
        )
        if kv_edge:
            needs_mask = needs_mask | (ik == n_kv_tiles - 1)

        if lagged_env:
            # The FIRST visited tile takes the standard (exact, serialized)
            # path so the lagged frame starts at a true rowmax — otherwise
            # the frame-0 fallback's +60 clamp bites real data whose tile-0
            # scores exceed 60 (test_lagged_max_extreme_scores_no_nan).
            # Serializing 1/n_kv_tiles of the work is noise. With sinks the
            # run set is non-contiguous and the first band tile re-flags as
            # "first" — harmlessly exact. (run_prev is False at ik == 0.)
            run_prev = (ik > 0) & _causal_should_run(
                iq, jnp.maximum(ik - 1, 0), block_q, block_k, offset,
                window, sinks,
            )
            first = jnp.logical_not(run_prev)
            for use_mask in (True, False):
                mask_pred = needs_mask if use_mask else (
                    jnp.logical_not(needs_mask)
                )
                for is_first in (True, False):
                    first_pred = first if is_first else (
                        jnp.logical_not(first)
                    )

                    @pl.when(run & mask_pred & first_pred)
                    def _br(use_mask=use_mask, is_first=is_first):
                        _update(use_mask, lagged_tile=not is_first)
        else:
            @pl.when(run & needs_mask)
            def _masked():
                _update(True)

            @pl.when(run & jnp.logical_not(needs_mask))
            def _unmasked():
                _update(False)
    elif kv_edge:
        edge = ik == n_kv_tiles - 1
        if lagged_env:
            for use_mask in (True, False):
                mask_pred = edge if use_mask else jnp.logical_not(edge)
                for is_first in (True, False):
                    first_pred = (ik == 0) if is_first else (ik != 0)

                    @pl.when(mask_pred & first_pred)
                    def _br2(use_mask=use_mask, is_first=is_first):
                        _update(use_mask, lagged_tile=not is_first)
        else:
            @pl.when(edge)
            def _edge():
                _update(True)

            @pl.when(jnp.logical_not(edge))
            def _body():
                _update(False)
    else:
        if lagged_env:
            @pl.when(ik == 0)
            def _first():
                _update(False, lagged_tile=False)

            @pl.when(ik != 0)
            def _rest():
                _update(False, lagged_tile=True)
        else:
            _update(False)

    @pl.when(ik == n_kv_tiles - 1)
    def _store():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log(l_safe)


def _flash_fwd(
    q, k, v, seed, qoff, *, causal, softmax_scale, block_q, block_k,
    interpret, n_q, n_k, dropout_rate, stages=2, window=None,
    q_seg=None, kv_seg=None, softcap=None, slopes=None, sinks=0,
):
    b, h, n_q_pad, d = q.shape
    h_kv = k.shape[1]
    groups = h // h_kv
    n_k_pad = k.shape[2]
    grid = (b, h, n_q_pad // block_q, n_k_pad // block_k)
    segmented = q_seg is not None
    if qoff is None:
        # None = "caller did not specify a look-ahead offset": the
        # default self-attention alignment. Kept as None through the
        # custom_vjp residuals so _flash_bwd knows the geometry is its
        # own to decompose (q-slab path).
        qoff = jnp.asarray([n_k - n_q], jnp.int32)

    kernel = functools.partial(
        _fwd_kernel,
        softmax_scale=softmax_scale,
        causal=causal,
        n_q=n_q,
        n_k=n_k,
        block_q=block_q,
        block_k=block_k,
        dropout_rate=dropout_rate,
        window=window,
        segmented=segmented,
        softcap=softcap,
        alibi=slopes is not None,
        sinks=sinks,
    )
    # ``stages`` — the FAx pipeline-depth knob (the reference plumbs it but
    # never uses it, quirk Q6; src/fa3/spec.py:3-13). Here it sets the K/V
    # stream's in-flight buffer count: 1 = no software pipelining (FA1-era
    # schedule, halved VMEM), 2 = double buffering (Mosaic's max/default).
    kv_pipeline = (
        pl.Buffered(buffer_count=1)
        if (stages == 1 and not interpret) else None
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # qoff scalar
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        pl.BlockSpec(
            (1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_ // groups, ik, 0),
            pipeline_mode=kv_pipeline,
        ),
        pl.BlockSpec(
            (1, 1, block_k, d), lambda b_, h_, iq, ik: (b_, h_ // groups, ik, 0),
            pipeline_mode=kv_pipeline,
        ),
    ]
    args = [qoff, q, k, v]
    if segmented:
        # Segment-id blocks ride ahead of q/k/v (after the SMEM scalars):
        # q ids lane-replicated (B, N_q_pad, LANES), kv ids (B, 1, N_k_pad).
        in_specs[1:1] = [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b_, h_, iq, ik: (b_, iq, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda b_, h_, iq, ik: (b_, 0, ik)),
        ]
        args[1:1] = [q_seg, kv_seg]
    if slopes is not None:
        idx = 3 if segmented else 1  # after [qoff(, qseg, kseg)]
        in_specs.insert(idx, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(idx, slopes)
    if dropout_rate > 0.0:
        in_specs.insert(
            1, pl.BlockSpec(memory_space=pltpu.SMEM)
        )
        args.insert(1, seed)
    flops_mm = 4 * b * h * n_q * n_k * d
    o, lse = _softcap_launch(pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            # LSE rides as (B, H, N, 1): TPU block shapes need the last two
            # dims divisible by (8, 128) or equal to the array dims.
            pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_q_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * n_q * n_k,
        ),
        interpret=interpret,
    ), interpret, *args)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    *refs,
    softmax_scale, causal, n_q, n_k, block_q, block_k, dropout_rate,
    window=None, segmented=False, softcap=None, alibi=False, sinks=0,
):
    """dK/dV: one grid cell per KV tile, sequential loop over Q tiles.

    Recomputes p = exp(s*scale - lse) from the saved LSE. softmax_scale is
    folded into the q TILE on load: s2 comes out pre-scaled, and because
    dK = scale * sum(ds^T q) = sum(ds^T (scale*q)), the dk store needs no
    scale either — the only per-tile scale cost is bq x d multiplies.
    """
    qoff_ref, seed_ref, qseg_ref, kseg_ref, slopes_ref, rest = _unpack_refs(
        refs, dropout_rate, segmented, alibi
    )
    (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
     dk_ref, dv_ref, dk_scr, dv_scr) = rest
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    n_q_tiles = pl.num_programs(3)
    offset = qoff_ref[0]  # see _fwd_kernel note
    kv_edge = n_k % block_k != 0

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _update(use_mask):
        q = q_ref[0, 0] * softmax_scale  # scale folded into the q tile
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]  # (bq, 1)
        di = di_ref[0, 0]     # (bq, 1)

        s2, mask, dcap = _bwd_scores(
            q, k, alibi=alibi, slopes_ref=slopes_ref, ih=ih,
            softcap=softcap, use_mask=use_mask, segmented=segmented,
            qseg_ref=qseg_ref, kseg_ref=kseg_ref, iq=iq, ik=ik,
            block_q=block_q, block_k=block_k, n_q=n_q, n_k=n_k,
            causal=causal, offset=offset, window=window, sinks=sinks,
        )
        # dp is issued BEFORE the exp: it does not depend on p, so the
        # scheduler may overlap the VPU softmax recompute with this MXU
        # pass instead of serializing MXU -> VPU -> MXU.
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(s2 - lse2)  # (bq, bk) softmax probabilities
        if mask is not None:
            # Rows with no valid keys carry a garbage finite LSE; exact
            # zeroing keeps them out of dK/dV (matches the forward).
            p = jnp.where(mask, p, 0.0)
        if dropout_rate > 0.0:
            bh = ib * pl.num_programs(1) + ih
            keep = _keep_mask(
                seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
            )
            inv = 1.0 / (1.0 - dropout_rate)
            p_v = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dp * inv, 0.0)
        else:
            p_v = p

        dv_scr[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di)
        if dcap is not None:
            ds = ds * dcap  # chain through the soft-cap to raw scores
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        run = _causal_should_run(iq, ik, block_q, block_k, offset, window,
                                 sinks)
        needs_mask = _causal_needs_mask(
            iq, ik, block_q, block_k, offset, window, sinks
        )
        if kv_edge:
            needs_mask = needs_mask | (ik == pl.num_programs(2) - 1)

        @pl.when(run & needs_mask)
        def _masked():
            _update(True)

        @pl.when(run & jnp.logical_not(needs_mask))
        def _unmasked():
            _update(False)
    elif kv_edge:
        is_edge = ik == pl.num_programs(2) - 1

        @pl.when(is_edge)
        def _edge():
            _update(True)

        @pl.when(jnp.logical_not(is_edge))
        def _body():
            _update(False)
    else:
        _update(False)

    @pl.when(iq == n_q_tiles - 1)
    def _store():
        # No scale here: the q tiles were pre-scaled, so dk_scr already
        # holds sum(ds^T (scale*q)) == scale * sum(ds^T q) == dK.
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    *refs,
    softmax_scale, causal, n_q, n_k, block_q, block_k, dropout_rate,
    window=None, segmented=False, softcap=None, alibi=False, sinks=0,
    resident,
):
    """Fused backward: dK/dV accumulated in scratch per KV tile, plus dQ by
    one of two strategies (TPU has no atomics — the reference's Triton dQ
    uses fp16 atomic_add, src/fa1/triton/kernels_bwd.py:89):

    - ``resident`` (default when it fits): the WHOLE dQ lives in a
      (N_q_pad, D) fp32 VMEM scratch, accumulated across the outer KV-tile
      sweep and written to HBM exactly once during the final sweep (the dq
      output's index map parks every earlier sweep at block 0, whose only
      write-back carries the final sweep's real values).
      Zero extra HBM traffic; 5 matmul passes vs the split pair's 7.
    - partial (large N fallback): a dQ partial per (KV tile, Q tile) grid
      cell, reduced over the KV axis outside the kernel (XLA sum) — costs
      an O(n_k_tiles · N_q · D) fp32 buffer's write+read.
    """
    qoff_ref, seed_ref, qseg_ref, kseg_ref, slopes_ref, rest = _unpack_refs(
        refs, dropout_rate, segmented, alibi
    )
    (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
     dk_ref, dv_ref, dq_ref, dk_scr, dv_scr, *dq_scr) = rest
    dq_scr = dq_scr[0] if resident else None
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    n_q_tiles = pl.num_programs(3)
    n_k_tiles = pl.num_programs(2)
    offset = qoff_ref[0]  # see _fwd_kernel note
    kv_edge = n_k % block_k != 0

    @pl.when(iq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if resident:
        @pl.when(ik == 0)
        def _init_dq():
            dq_scr[pl.ds(iq * block_q, block_q), :] = jnp.zeros(
                (block_q, dq_scr.shape[1]), jnp.float32
            )

    def _update(use_mask):
        q = q_ref[0, 0] * softmax_scale  # scale folded into the q tile
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]  # (bq, 1)
        di = di_ref[0, 0]     # (bq, 1)

        s2, mask, dcap = _bwd_scores(
            q, k, alibi=alibi, slopes_ref=slopes_ref, ih=ih,
            softcap=softcap, use_mask=use_mask, segmented=segmented,
            qseg_ref=qseg_ref, kseg_ref=kseg_ref, iq=iq, ik=ik,
            block_q=block_q, block_k=block_k, n_q=n_q, n_k=n_k,
            causal=causal, offset=offset, window=window, sinks=sinks,
        )
        # dp before exp: overlap the VPU recompute with this MXU pass
        # (see dkv kernel note).
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(s2 - lse2)  # (bq, bk)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)  # see dkv kernel note
        if dropout_rate > 0.0:
            bh = ib * pl.num_programs(1) + ih
            keep = _keep_mask(
                seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
            )
            inv = 1.0 / (1.0 - dropout_rate)
            p_v = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dp * inv, 0.0)
        else:
            p_v = p

        dv_scr[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di)
        if dcap is not None:
            ds = ds * dcap  # chain through the soft-cap to raw scores
        ds_cast = ds.astype(q.dtype)
        dk_scr[...] += jax.lax.dot_general(
            ds_cast, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dQ DOES still need the scale (dQ = scale * sum(ds k); k is
        # unscaled) — applied once at flush, not per tile.
        dq_tile = jax.lax.dot(ds_cast, k, preferred_element_type=jnp.float32)
        if resident:
            sl = pl.ds(iq * block_q, block_q)
            dq_scr[sl, :] += dq_tile
        else:
            dq_ref[0, 0, 0] = dq_tile * jnp.float32(softmax_scale)

    if causal:
        run = _causal_should_run(iq, ik, block_q, block_k, offset, window,
                                 sinks)
        needs_mask = _causal_needs_mask(
            iq, ik, block_q, block_k, offset, window, sinks
        )
        if kv_edge:
            needs_mask = needs_mask | (ik == n_k_tiles - 1)

        @pl.when(run & needs_mask)
        def _masked():
            _update(True)

        @pl.when(run & jnp.logical_not(needs_mask))
        def _unmasked():
            _update(False)

        if not resident:
            @pl.when(jnp.logical_not(run))
            def _skipped():
                dq_ref[0, 0, 0] = jnp.zeros_like(dq_ref[0, 0, 0])
    elif kv_edge:
        is_edge = ik == n_k_tiles - 1

        @pl.when(is_edge)
        def _edge():
            _update(True)

        @pl.when(jnp.logical_not(is_edge))
        def _body():
            _update(False)
    else:
        _update(False)

    @pl.when(iq == n_q_tiles - 1)
    def _store():
        # dk_scr holds sum(ds^T (scale*q)) == dK exactly (see dkv kernel).
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)

    if resident:
        # Final KV sweep: flush this Q tile's finished dQ row block. (On
        # earlier sweeps the dq output's index map parks at block 0 and
        # never changes, so Mosaic never writes the parked block back.)
        @pl.when(ik == n_k_tiles - 1)
        def _store_dq():
            dq_ref[0, 0] = (
                dq_scr[pl.ds(iq * block_q, block_q), :]
                * jnp.float32(softmax_scale)
            ).astype(dq_ref.dtype)


def _bwd_dq_kernel(
    *refs,
    softmax_scale, causal, n_q, n_k, block_q, block_k, dropout_rate,
    window=None, segmented=False, softcap=None, alibi=False, sinks=0,
):
    qoff_ref, seed_ref, qseg_ref, kseg_ref, slopes_ref, rest = _unpack_refs(
        refs, dropout_rate, segmented, alibi
    )
    (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr) = rest
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv_tiles = pl.num_programs(3)
    offset = qoff_ref[0]  # see _fwd_kernel note

    kv_edge = n_k % block_k != 0

    @pl.when(ik == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def _update(use_mask):
        q = q_ref[0, 0] * softmax_scale  # scale folded into the q tile
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]  # (bq, 1)
        di = di_ref[0, 0]     # (bq, 1)

        s2, mask, dcap = _bwd_scores(
            q, k, alibi=alibi, slopes_ref=slopes_ref, ih=ih,
            softcap=softcap, use_mask=use_mask, segmented=segmented,
            qseg_ref=qseg_ref, kseg_ref=kseg_ref, iq=iq, ik=ik,
            block_q=block_q, block_k=block_k, n_q=n_q, n_k=n_k,
            causal=causal, offset=offset, window=window, sinks=sinks,
        )
        # dp before exp: overlap the VPU recompute with this MXU pass
        # (see dkv kernel note).
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(s2 - lse2)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)  # see dkv kernel note
        if dropout_rate > 0.0:
            bh = ib * pl.num_programs(1) + ih
            keep = _keep_mask(
                seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
            )
            dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
        ds = p * (dp - di)
        if dcap is not None:
            ds = ds * dcap  # chain through the soft-cap to raw scores
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    if causal:
        run = _causal_should_run(iq, ik, block_q, block_k, offset, window,
                                 sinks)
        needs_mask = _causal_needs_mask(
            iq, ik, block_q, block_k, offset, window, sinks
        )
        if kv_edge:
            needs_mask = needs_mask | (ik == n_kv_tiles - 1)

        @pl.when(run & needs_mask)
        def _masked():
            _update(True)

        @pl.when(run & jnp.logical_not(needs_mask))
        def _unmasked():
            _update(False)
    elif kv_edge:
        is_edge = ik == n_kv_tiles - 1

        @pl.when(is_edge)
        def _edge():
            _update(True)

        @pl.when(jnp.logical_not(is_edge))
        def _body():
            _update(False)
    else:
        _update(False)

    @pl.when(ik == n_kv_tiles - 1)
    def _store():
        # softmax_scale applied once here instead of on every O(N^2) ds tile.
        dq_ref[0, 0] = (
            dq_scr[...] * jnp.float32(softmax_scale)
        ).astype(dq_ref.dtype)


def _flash_bwd(
    q, k, v, o, lse, do, seed, *, causal, softmax_scale, block_q, block_k,
    interpret, n_q, n_k, dropout_rate, dlse=None, qoff=None, window=None,
    q_seg=None, kv_seg=None, softcap=None, slopes=None, sinks=0,
):
    b, h, n_q_pad, d = q.shape
    h_kv = k.shape[1]
    groups = h // h_kv
    n_k_pad = k.shape[2]
    # di = rowsum(o * do), shared by both backward kernels; carried as
    # (B, H, N, 1) for TPU block-shape legality (see forward LSE note).
    # The LSE cotangent folds in exactly: d lse_i / d s_ij = p_ij, so
    # ds = p * (dp - di + dlse) == p * (dp - (di - dlse)).
    di = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    if dlse is not None:
        di = di - dlse.astype(jnp.float32)
    qoff_given = qoff is not None
    if qoff is None:
        qoff = jnp.asarray([n_k - n_q], jnp.int32)

    segmented = q_seg is not None
    common = dict(
        softmax_scale=softmax_scale, causal=causal, n_q=n_q, n_k=n_k,
        block_q=block_q, block_k=block_k, dropout_rate=dropout_rate,
        window=window, segmented=segmented, softcap=softcap,
        alibi=slopes is not None, sinks=sinks,
    )
    # Pipeline depth for the inner-loop-streamed Q-side inputs (q, do): the
    # bwd analogue of the forward's ``stages`` knob. Buffered(1) halves
    # their double-buffer VMEM at the cost of DMA/compute overlap.
    q_pipeline = (
        pl.Buffered(buffer_count=1)
        if (int(os.environ.get("FAT_BWD_STAGES", _BWD_STAGES)) == 1
            and not interpret) else None
    )
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, j, 0),
        pipeline_mode=q_pipeline,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_ // groups, i, 0)
    )
    # dK/dV are accumulated per *query* head (grid over h) and reduced over
    # the group outside — TPU has no atomics and group-reduction inside the
    # grid would serialize KV tiles.
    dkv_spec = pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, i, 0))
    row_spec = pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i, j: (b_, h_, j, 0))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # qoff scalar
        q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec,
    ]
    args = [qoff, q, k, v, do, lse, di]
    if segmented:
        # dkv/fused grids iterate (b, h, i=KV tile, j=Q tile).
        in_specs[1:1] = [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b_, h_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda b_, h_, i, j: (b_, 0, i)),
        ]
        args[1:1] = [q_seg, kv_seg]
    if slopes is not None:
        idx = 3 if segmented else 1
        in_specs.insert(idx, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(idx, slopes)
    if dropout_rate > 0.0:
        in_specs.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(1, seed)

    n_k_tiles = n_k_pad // block_k
    n_q_tiles = n_q_pad // block_q
    # Backward strategy. The fused kernel (dK/dV in scratch + per-KV-tile dQ
    # partials reduced in XLA) does 5 matmul passes vs the split pair's 7;
    # honest A/B (all grads consumed — a dq-only loss lets XLA DCE the split
    # path's dKV kernel, which invalidated the round-1 comparison) puts
    # fused 1.19x AHEAD at N=8K d=128 (6.21 vs 7.40 ms, 2026-08-17).
    # FAT_BWD_IMPL=split selects the pair (less HBM partial traffic — may
    # win at longer N where the partial buffer grows). Read at TRACE time,
    # not import time, so tests/A-B harnesses can flip it per call
    # (a module-level read made monkeypatch.setenv a silent no-op).
    fused = os.environ.get("FAT_BWD_IMPL", _BWD_IMPL) == "fused"

    # dK/dV leave the kernel in the INPUT dtype when no group reduction
    # follows (groups == 1, the common case): the scratch accumulates in
    # fp32 either way, and storing bf16 directly halves the grad write
    # traffic and deletes a whole XLA astype pass over each (B,H,N,D)
    # buffer. With GQA groups the fp32 output is kept so the group sum
    # stays exact.
    dkv_dtype = k.dtype if groups == 1 else jnp.float32

    # dQ residency: keep the whole (N_q_pad, D) fp32 dQ in VMEM scratch
    # when the kernel's TOTAL VMEM footprint fits — zero partial-buffer
    # HBM traffic. The budget must count the tile pipeline too, not just
    # the scratch: dQ scratch + dk/dv scratch + double-buffered in/out
    # blocks. (At N=8K d=256 the old "dQ <= 8 MB" gate passed exactly at
    # the boundary and Mosaic OOM'd scoped vmem by 512 KB: 16.5 MB vs
    # the 16 MB limit, measured 2026-08-17.)
    isz = q.dtype.itemsize
    osz = jnp.dtype(dkv_dtype).itemsize
    vmem_est = (
        n_q_pad * d * 4                  # resident dQ scratch (fp32)
        + 2 * block_k * d * 4            # dk/dv fp32 scratch
        + 2 * 2 * (block_q * d * isz)    # q, do in-blocks (x2 buffers)
        + 2 * 2 * (block_k * d * isz)    # k, v in-blocks
        + 2 * 2 * (block_k * d * osz)    # dk, dv out-blocks
        + 2 * (block_q * d * isz)        # dq out-block (input dtype)
    )
    # Budget = 12 MB of the 16 MB scoped-vmem limit: vmem_est counts the
    # scratch + pipeline BLOCKS but not the kernel's STACK temporaries
    # (the live (block_q, block_k) score/p/ds planes), which Mosaic also
    # charges to scoped vmem — measured 2.68 MB at (512, 1024) d=256
    # (queue17/ab_bwd_slab_8k: est 14.0 MB compiled to a 16.68 MB scoped
    # allocation, 692 KB over the limit). 12 MB keeps every previously
    # proven-resident config resident (d=128 N<=28K est<=9.8 MB, d=256
    # N=4K est 11.5 MB) while giving the stack ~4 MB of headroom.
    # Trace-time env override for tests/A-Bs: forces the non-resident
    # paths (slab decomposition, split) at CPU-sized shapes.
    vmem_budget = int(
        os.environ.get("FAT_BWD_VMEM_BUDGET", str(12 * 1024 * 1024))
    )
    resident = vmem_est <= vmem_budget
    # Non-resident shapes, first choice (round 5, VERDICT r4 item 3 — the
    # d=256 long-N cliff): Q-SLAB DECOMPOSITION. Split the q range into
    # slabs whose resident-dQ scratch fits the budget and run the fused
    # RESIDENT kernel once per slab, with K/V causally TRUNCATED to the
    # slab's reachable columns — the (truncated-K, offset) representation
    # preserves the causal/window/sinks/ALiBi geometry exactly (q global
    # position = local row + offset), so each slab computes exactly its
    # rows' tiles and the union is exactly the full tile set. dQ rows
    # concatenate; dK/dV contributions sum (fp32). Costs vs a would-be
    # whole-N resident kernel: K/V restream once per slab (HBM-cheap at
    # these compute-bound shapes) + one pallas dispatch per slab inside
    # the same jit. This keeps the MEASURED-best (512, 1024) blocks at
    # d=256 — the smaller-block retuning space is fenced off by the
    # deterministic Mosaic compile hangs ((256,512) and (1024,1024) at
    # d=256, CLAUDE.md).
    #
    # Not taken with dropout (the counter-based keep-mask keys on GLOBAL
    # q-tile indices; a slab's local indices would replay a different
    # mask than the forward's) or an explicit qoff (look-ahead decode
    # callers own the geometry). FAT_BWD_SLAB=0 disables for A/Bs.
    if fused and not resident:
        non_dq_vmem = vmem_est - n_q_pad * d * 4
        slab_budget = (vmem_budget - non_dq_vmem) // (d * 4)
        slab = (slab_budget // block_q) * block_q
        if (
            os.environ.get("FAT_BWD_SLAB", "1") == "1"
            and dropout_rate == 0.0
            and not qoff_given
            and block_q <= slab < n_q_pad
        ):
            offset = n_k - n_q
            dq_parts = []
            dk_acc = jnp.zeros((b, h_kv, n_k_pad, d), jnp.float32)
            dv_acc = jnp.zeros((b, h_kv, n_k_pad, d), jnp.float32)
            for a in range(0, n_q_pad, slab):
                rows = min(slab, n_q_pad - a)
                if causal:
                    # UNclamped truncation keeps the inner offset exactly
                    # k_end - rows = a + offset (the global geometry). A
                    # slab whose rows attend nothing (negative-offset
                    # cross-attention) contributes zero grads directly —
                    # clamping k_end instead would shift the diagonal.
                    k_end = min(n_k, a + rows + offset)
                    if k_end <= 0:
                        dq_parts.append(jnp.zeros(
                            (b, h, rows, d), q.dtype
                        ))
                        continue
                else:
                    k_end = n_k
                k_end_pad = min(-(-k_end // block_k) * block_k, n_k_pad)
                sl_kv = (slice(None), slice(None), slice(0, k_end_pad))
                dq_s, dk_s, dv_s = _flash_bwd(
                    q[:, :, a:a + rows], k[sl_kv], v[sl_kv],
                    o[:, :, a:a + rows], lse[:, :, a:a + rows],
                    do[:, :, a:a + rows], seed,
                    causal=causal, softmax_scale=softmax_scale,
                    block_q=block_q, block_k=block_k, interpret=interpret,
                    n_q=min(n_q - a, rows), n_k=k_end,
                    dropout_rate=0.0,
                    dlse=(dlse[:, :, a:a + rows]
                          if dlse is not None else None),
                    window=window,
                    q_seg=(q_seg[:, a:a + rows]
                           if q_seg is not None else None),
                    kv_seg=(kv_seg[:, :, :k_end_pad]
                            if kv_seg is not None else None),
                    softcap=softcap, slopes=slopes, sinks=sinks,
                )
                dq_parts.append(dq_s)
                dk_acc = dk_acc.at[:, :, :k_end_pad].add(
                    dk_s.astype(jnp.float32)
                )
                dv_acc = dv_acc.at[:, :, :k_end_pad].add(
                    dv_s.astype(jnp.float32)
                )
            return (
                jnp.concatenate(dq_parts, axis=2),
                dk_acc.astype(k.dtype),
                dv_acc.astype(v.dtype),
            )
        # Fallbacks: the fused dQ-PARTIAL buffer ((b, h, n_k_tiles, N_q, d)
        # fp32 — O(N^2/block_k) HBM, measured 4.9 GB peak at N=32K d=128,
        # memory_r03.json) only under FAT_BWD_PARTIAL=1; else the split
        # pair, which stays O(N).
        fused = os.environ.get("FAT_BWD_PARTIAL", "0") == "1"

    if fused:
        if resident:
            # Earlier KV sweeps park the dq output block on index 0; the
            # index only CHANGES at the final sweep, so Mosaic never flushes
            # the (unwritten) parked block — block 0's only write-back
            # carries the real values the final sweep's first step stores.
            # This keeps the output at exactly (N_q_pad, D) in the input
            # dtype: no padding block, no XLA slice, no astype pass.
            dq_spec = pl.BlockSpec(
                (1, 1, block_q, d),
                lambda b_, h_, i, j: (
                    b_, h_,
                    jnp.where(i == n_k_tiles - 1, j, 0), 0,
                ),
            )
            dk, dv, dq = _softcap_launch(pl.pallas_call(
                functools.partial(_bwd_fused_kernel, resident=True, **common),
                grid=(b, h, n_k_tiles, n_q_tiles),
                in_specs=in_specs,
                out_specs=[dkv_spec, dkv_spec, dq_spec],
                out_shape=[
                    jax.ShapeDtypeStruct((b, h, n_k_pad, d), dkv_dtype),
                    jax.ShapeDtypeStruct((b, h, n_k_pad, d), dkv_dtype),
                    jax.ShapeDtypeStruct((b, h, n_q_pad, d), q.dtype),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((n_q_pad, d), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    # ik carries the dq accumulator across sweeps ->
                    # sequential ("arbitrary"), like iq for dkv.
                    dimension_semantics=(
                        "parallel", "parallel", "arbitrary", "arbitrary",
                    ),
                ),
                interpret=interpret,
            ), interpret, *args)
        else:
            dq_part_spec = pl.BlockSpec(
                (1, 1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, j, 0)
            )
            dk, dv, dq_part = _softcap_launch(pl.pallas_call(
                functools.partial(
                    _bwd_fused_kernel, resident=False, **common
                ),
                grid=(b, h, n_k_tiles, n_q_tiles),
                in_specs=in_specs,
                out_specs=[dkv_spec, dkv_spec, dq_part_spec],
                out_shape=[
                    jax.ShapeDtypeStruct((b, h, n_k_pad, d), dkv_dtype),
                    jax.ShapeDtypeStruct((b, h, n_k_pad, d), dkv_dtype),
                    # dQ partials stay fp32: the XLA reduce over the KV
                    # axis must accumulate exactly.
                    jax.ShapeDtypeStruct(
                        (b, h, n_k_tiles, n_q_pad, d), jnp.float32
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(
                        "parallel", "parallel", "parallel", "arbitrary",
                    ),
                ),
                interpret=interpret,
            ), interpret, *args)
            dq = dq_part.sum(axis=2).astype(q.dtype)
        if groups > 1:
            dk = dk.reshape(b, h_kv, groups, n_k_pad, d).sum(axis=2)
            dv = dv.reshape(b, h_kv, groups, n_k_pad, d).sum(axis=2)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    dk, dv = _softcap_launch(pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(b, h, n_k_tiles, n_q_tiles),
        in_specs=in_specs,
        out_specs=[dkv_spec, dkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_k_pad, d), dkv_dtype),
            jax.ShapeDtypeStruct((b, h, n_k_pad, d), dkv_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    ), interpret, *args)
    if groups > 1:
        dk = dk.reshape(b, h_kv, groups, n_k_pad, d).sum(axis=2)
        dv = dv.reshape(b, h_kv, groups, n_k_pad, d).sum(axis=2)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)

    q_spec2 = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0))
    kv_spec2 = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_ // groups, j, 0)
    )
    row_spec2 = pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i, j: (b_, h_, i, 0))

    in_specs2 = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # qoff scalar
        q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2,
    ]
    args2 = [qoff, q, k, v, do, lse, di]
    if segmented:
        # dq grid iterates (b, h, i=Q tile, j=KV tile).
        in_specs2[1:1] = [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b_, h_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda b_, h_, i, j: (b_, 0, j)),
        ]
        args2[1:1] = [q_seg, kv_seg]
    if slopes is not None:
        idx = 3 if segmented else 1
        in_specs2.insert(idx, pl.BlockSpec(memory_space=pltpu.SMEM))
        args2.insert(idx, slopes)
    if dropout_rate > 0.0:
        in_specs2.insert(1, pl.BlockSpec(memory_space=pltpu.SMEM))
        args2.insert(1, seed)

    dq = _softcap_launch(pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(b, h, n_q_pad // block_q, n_k_pad // block_k),
        in_specs=in_specs2,
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    ), interpret, *args2)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Padding wrapper + custom_vjp
# ---------------------------------------------------------------------------


def _pad_dim(x, axis, multiple, value=0.0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _choose_blocks(n_q, n_k, block_q, block_k):
    bq = min(block_q, max(MIN_BLOCK, _round_up(n_q, 8)))
    bk = min(block_k, max(MIN_BLOCK, _round_up(n_k, MIN_BLOCK)))
    # Keep tiles aligned: bq multiple of 8, bk multiple of 128.
    bq = max(8, (bq // 8) * 8)
    bk = max(MIN_BLOCK, (bk // MIN_BLOCK) * MIN_BLOCK)
    return bq, bk


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _prepare(q, k, v, block_q, block_k):
    """Pad seq dims to tile multiples and head dim to a lane multiple."""
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    bq, bk = _choose_blocks(n_q, n_k, block_q, block_k)
    q = _pad_dim(q, 2, bq)
    k = _pad_dim(k, 2, bk)
    v = _pad_dim(v, 2, bk)
    if d % LANES and d != 64:
        q = _pad_dim(q, 3, LANES)
        k = _pad_dim(k, 3, LANES)
        v = _pad_dim(v, 3, LANES)
    return q, k, v, bq, bk, n_q, n_k, d


def _seg_layouts(q_ids, kv_ids, bq, bk):
    """Kernel-ready segment-id layouts from raw (B, N) ids.

    Pads each side to its tile multiple with side-specific sentinels (a
    padded q row can never match a padded kv col), then lays q ids out
    lane-replicated (B, N_q_pad, LANES) and kv ids (B, 1, N_k_pad) — the
    Mosaic-legal block layouts _seg_tile_mask expects.
    """
    qp = _pad_dim(q_ids, 1, bq, value=_SEG_PAD_Q)
    kp = _pad_dim(kv_ids, 1, bk, value=_SEG_PAD_K)
    b, n_q_pad = qp.shape
    q_seg = jax.lax.broadcast_in_dim(qp, (b, n_q_pad, LANES), (0, 1))
    return q_seg, kp[:, None, :]


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19),
)
def _flash_attention(
    q, k, v, seed, qoff, q_ids, kv_ids, slopes, causal, softmax_scale,
    block_q, block_k, interpret, dropout_rate, stages, bwd_block_q,
    bwd_block_k, window, softcap, sinks,
):
    o, lse = _flash_attention_fwd_rule(
        q, k, v, seed, qoff, q_ids, kv_ids, slopes, causal, softmax_scale,
        block_q, block_k, interpret, dropout_rate, stages, bwd_block_q,
        bwd_block_k, window, softcap, sinks,
    )[0]
    return o, lse


def _flash_attention_fwd_rule(
    q, k, v, seed, qoff, q_ids, kv_ids, slopes, causal, softmax_scale,
    block_q, block_k, interpret, dropout_rate, stages, bwd_block_q,
    bwd_block_k, window, softcap, sinks,
):
    qp, kp, vp, bq, bk, n_q, n_k, d = _prepare(q, k, v, block_q, block_k)
    q_seg = kv_seg = None
    if q_ids is not None:
        q_seg, kv_seg = _seg_layouts(q_ids, kv_ids, bq, bk)
    o, lse = _flash_fwd(
        qp, kp, vp, seed, qoff, causal=causal, softmax_scale=softmax_scale,
        block_q=bq, block_k=bk, interpret=interpret, n_q=n_q, n_k=n_k,
        dropout_rate=dropout_rate, stages=stages, window=window,
        q_seg=q_seg, kv_seg=kv_seg, softcap=softcap, slopes=slopes,
        sinks=sinks,
    )
    o_out = o[:, :, :n_q, :d]
    lse_out = lse[:, :, :n_q, 0]
    return (o_out, lse_out), (q, k, v, seed, qoff, q_ids, kv_ids, slopes,
                              o_out, lse_out)


def _flash_attention_bwd_rule(
    causal, softmax_scale, block_q, block_k, interpret, dropout_rate, stages,
    bwd_block_q, bwd_block_k, window, softcap, sinks, residuals, cotangents,
):
    q, k, v, seed, qoff, q_ids, kv_ids, slopes, o, lse = residuals
    do, dlse = cotangents
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    # Backward may tile differently from the forward (residuals o/lse are
    # block-shape independent): the measured optimum differs per direction —
    # e.g. d=64 forward wants (1024, 1024) but that backward hangs Mosaic
    # (RESULTS.md "Spec table").
    qp, kp, vp, bq, bk, n_q, n_k, d = _prepare(
        q, k, v, bwd_block_q or block_q, bwd_block_k or block_k
    )
    op = _pad_dim(o, 2, bq)
    dop = _pad_dim(do, 2, bq)
    if op.shape[-1] != qp.shape[-1]:
        op = _pad_dim(op, 3, LANES)
        dop = _pad_dim(dop, 3, LANES)
    # Padded query rows: force p = exp(s - lse) = 0 via a huge lse.
    lsep = _pad_dim(lse, 2, bq, value=1e9)[..., None]
    dlsep = _pad_dim(dlse, 2, bq)[..., None]
    q_seg = kv_seg = None
    if q_ids is not None:
        # Rebuilt at the BACKWARD's tile sizes (they may differ from the
        # forward's — see spec-table note above).
        q_seg, kv_seg = _seg_layouts(q_ids, kv_ids, bq, bk)
    dq, dk, dv = _flash_bwd(
        qp, kp, vp, op, lsep, dop, seed, causal=causal,
        softmax_scale=softmax_scale, block_q=bq, block_k=bk,
        interpret=interpret, n_q=n_q, n_k=n_k, dropout_rate=dropout_rate,
        dlse=dlsep, qoff=qoff, window=window, q_seg=q_seg, kv_seg=kv_seg,
        softcap=softcap, slopes=slopes, sinks=sinks,
    )
    return (
        dq[:, :, :n_q, :d].astype(q.dtype),
        dk[:, :, :n_k, :d].astype(k.dtype),
        dv[:, :, :n_k, :d].astype(v.dtype),
        None,
        None,
        None,
        None,
        None,
    )


_flash_attention.defvjp(_flash_attention_fwd_rule, _flash_attention_bwd_rule)


def pallas_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
    q_offset: jax.Array | int | None = None,
    interpret: bool | None = None,
    stages: int = 2,
    bwd_block_q: int | None = None,
    bwd_block_k: int | None = None,
    window: int | None = None,
    segment_ids=None,
    softcap: float | None = None,
    alibi_slopes: jax.Array | None = None,
    sinks: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Flash attention on TPU via Pallas. (B, H, N, D) in, (o, lse) out.

    ``sinks``: StreamingLLM attention sinks — with ``window``, the first
    ``sinks`` key columns stay visible to every row in addition to the
    sliding band (sink tiles are never skipped; tiles wholly inside the
    sinks keep the unmasked fast path).

    ``alibi_slopes``: (H,) per-query-head ALiBi slopes — the bias
    -slope_h * |key_pos(col) - key_pos(row)| is computed IN-KERNEL from
    positions (no O(N^2) bias operand in HBM, unlike flash-attn's
    streamed-bias GPU design); rides the q_offset timeline, so KV-cache
    decode and ring/CP shards stay position-correct. Linear in s: the
    backward needs no extra chain terms.

    ``softcap``: logit soft-capping (Gemma-2-style; flash-attn's knob the
    reference lacks) — scaled scores become softcap * tanh(s / softcap)
    BEFORE masking, bounding |s| < softcap. The backward chains through
    the cap exactly (ds *= 1 - tanh^2); dV is unaffected (the value path
    skips the tanh).

    ``segment_ids``: packed variable-length attention (the TPU analogue of
    flash-attn's varlen/cu_seqlens API, which the reference lacks): an
    int32 (B, N) array — or a ``(q_ids, kv_ids)`` pair for q_len != k_len —
    marking each position's sequence; position i attends position j only
    when their ids are equal (AND the causal/window mask, if set). Ids must
    be >= 0 (negative values are reserved for padding sentinels). Packing
    many short sequences into one row this way keeps the MXU on one big
    batched matmul instead of ragged small ones; whole-tile skipping is
    not segment-aware (every in-band tile computes its segment compare),
    so prefer length-sorted packing for long rows of tiny segments.

    ``window``: sliding-window (local) attention — with ``causal=True``,
    row r attends only to the last ``window`` keys (cols in
    (r + q_offset - window, r + q_offset]). Tiles entirely outside the band
    are skipped (no DMA, no compute): O(N*window) work instead of O(N^2/2).
    Requires causal=True; window >= n_k degenerates to plain causal.

    ``stages``: forward K/V-stream pipeline depth — 1 disables software
    pipelining (single-buffered DMA, FA1-era schedule, halves KV VMEM),
    2 (default) double-buffers so DMA overlaps compute. The reference plumbs
    this knob but never uses it (quirk Q6, src/fa3/spec.py:3-13).

    ``bwd_block_q``/``bwd_block_k`` tile the backward independently of the
    forward (None = same as forward). The measured optimum differs per
    direction: at d=64 the (1024, 1024) forward is ~10% faster but its
    backward hangs the Mosaic compiler, so the spec table pairs it with a
    (512, 1024) backward (RESULTS.md "Spec table").

    K/V may carry fewer heads than Q (GQA/MQA): H % H_kv == 0; each group of
    H/H_kv query heads attends to one shared KV head.

    ``q_offset``: absolute key-timeline position of query row 0 under
    ``causal=True`` — row r attends to cols <= r + q_offset. Defaults to
    ``n_k - n_q`` (bottom-aligned; the KV-cache/decode convention of the
    reference's look_ahead_mask_, flashattention_pytorch.py:176-190). Ring /
    context-parallel shards pass their shard's offset — may be a traced
    scalar (it rides to the kernels in SMEM), so causal tile *skipping*
    follows the true diagonal on every shard instead of falling back to an
    elementwise mask.

    ``dropout_rate`` applies attention-weight dropout with inverted scaling
    (reference flashattention_pytorch.py:149-156); the keep mask is
    counter-based (hash of seed + absolute indices) and regenerated in the
    backward. ``dropout_seed`` may be a Python int or a traced uint32/int32
    scalar — pass a fresh value per training step.

    Differentiable via a custom VJP that recomputes P from the saved LSE
    (O(N) residual memory — the FlashAttention memory story).
    Runs in interpreter mode automatically off-TPU so the same tests execute
    on CPU (the reference's capability-gated-skip strategy, inverted: we
    emulate instead of skipping; SURVEY.md §4.3).
    """
    if q.ndim != 4:
        raise ValueError(f"expected (B, H, N, D), got {q.shape}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"H={q.shape[1]} must be a multiple of H_kv={k.shape[1]}"
        )
    d = q.shape[-1]
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if interpret is None:
        interpret = _interpret_default()
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = 0
    seed = jnp.asarray(dropout_seed, dtype=jnp.int32).reshape((1,))
    # qoff stays None for the default alignment (q block ends at the KV
    # end) — the backward uses None as the "geometry is canonical" signal
    # that enables the q-slab decomposition at non-resident shapes.
    qoff = (
        None if q_offset is None
        else jnp.asarray(q_offset, dtype=jnp.int32).reshape((1,))
    )
    if stages not in (1, 2):
        raise ValueError(f"stages must be 1 or 2 (Mosaic limit), got {stages}")
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
    if sinks:
        if window is None:
            raise ValueError("sinks require window= (StreamingLLM band)")
        if sinks < 0:
            raise ValueError(f"sinks must be >= 0, got {sinks}")
    q_ids = kv_ids = None
    if segment_ids is not None:
        if isinstance(segment_ids, (tuple, list)):
            if len(segment_ids) != 2:
                raise ValueError(
                    "segment_ids pair must be (q_ids, kv_ids), got "
                    f"{len(segment_ids)} elements"
                )
            q_ids, kv_ids = segment_ids
        else:
            if q.shape[-2] != k.shape[-2]:
                raise ValueError(
                    "one segment_ids array requires q_len == k_len "
                    f"({q.shape[-2]} != {k.shape[-2]}); pass a "
                    "(q_ids, kv_ids) pair"
                )
            q_ids = kv_ids = segment_ids
        q_ids = jnp.asarray(q_ids, jnp.int32)
        kv_ids = jnp.asarray(kv_ids, jnp.int32)
        if q_ids.shape != (q.shape[0], q.shape[-2]):
            raise ValueError(
                f"q segment_ids must be (B, N_q)={q.shape[0], q.shape[-2]}, "
                f"got {q_ids.shape}"
            )
        if kv_ids.shape != (k.shape[0], k.shape[-2]):
            raise ValueError(
                f"kv segment_ids must be (B, N_k)={k.shape[0], k.shape[-2]},"
                f" got {kv_ids.shape}"
            )
    slopes = None
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).ravel()
        if slopes.shape != (q.shape[1],):
            raise ValueError(
                f"alibi_slopes must be (H,)=({q.shape[1]},), "
                f"got {slopes.shape}"
            )
    return _flash_attention(
        q, k, v, seed, qoff, q_ids, kv_ids, slopes, causal,
        float(softmax_scale),
        int(block_q), int(block_k), bool(interpret), float(dropout_rate),
        int(stages),
        int(bwd_block_q) if bwd_block_q else None,
        int(bwd_block_k) if bwd_block_k else None,
        int(window) if window is not None else None,
        float(softcap) if softcap is not None else None,
        int(sinks),
    )
