"""Pallas paged-attention decode kernel.

Decode is HBM-bandwidth-bound: one query token attends to the whole KV
cache, so the kernel's job is to stream K/V pages from HBM at line rate and
hide the transfer behind the (tiny) per-page compute. Design:

- grid = (batch, page_step). Each grid step processes
  ``pages_per_step`` (S) pages: the physical page for slot s of step j is
  resolved *inside the BlockSpec index maps* from the scalar-prefetched page
  table (``PrefetchScalarGridSpec``): ``k_block_s = k_pages[h,
  page_indices[b, j*S + s]]``. Pallas's pipeline machinery double-buffers
  all S blocks — the fetches for step j+1 are in flight while step j
  computes.
- S amortizes the per-grid-step pipeline overhead, which dominates when
  pages are small (measured: page=64, S=1 reached only 5% of HBM line
  rate). S is chosen so each step covers >= 512 tokens.
- Page-table rows padded with a repeated page cost ~nothing: the index map
  returns the same block index, Pallas skips the re-fetch of an unchanged
  block, and compute for slots past the sequence's page count is predicated
  off.
- Quantized caches (int8 / float8_e4m3fn payloads with per-(page, slot) fp32
  scales — layout in serving/paged_kv.py) never see a per-element scale
  multiply: payloads are CONVERTED (astype / fp8 bit surgery) on landing and
  the per-slot scales fold into the score matrix (K) and the softmax weights
  p (V) as (rows, slots) row-vector multiplies — width x g_pad elements
  instead of width x D. Scales ride the pipeline lane-major ((H_kv, P, 1,
  page), transposed once outside the kernel): the naive layout's (page, 1)
  blocks put scales on a size-1 LANE dim, and the broadcast multiply from it
  is a Mosaic slow path that made int8 and fp8 decode equally 2.3x SLOWER
  than bf16 (decode_r03.json). The bandwidth win is the 1-byte payload on
  the wire.
- All KV heads of a page ride in ONE strided block fetch (block shape
  (H_kv, 1, page, D)) — fetch count is B x pages, not B x pages x H_kv;
  the kernel statically unrolls the per-head online-softmax update.
- GQA: all H/H_kv query heads of a group attend to the shared page block
  (q block (1, H_kv, G, D), G padded to >= 8 sublanes).

The XLA gather executor (serving/paged_kv.py:paged_attention_decode) is the
always-runs-anywhere correctness anchor; this kernel is the TPU fast path.
The reference repo has no serving layer at all — this is new scope from
BASELINE.json (FP8 paged KV decode); the closest reference analogue is the
KV-cache-shaped causal mask (src/fa3/torch/flashattention_pytorch.py:176-190).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.pallas_attn import _softcap_launch, _softcap_tanh
from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE as _MASK_VALUE



def _fp8_e4m3_to_bf16_bits(payload):
    """float8_e4m3fn -> bfloat16 via integer bit surgery.

    v5e has no fast fp8 conversion path (measured: ``.astype`` on an fp8
    payload runs ~2x slower end-to-end than int8), and at decode shapes the
    convert chain IS the quantized-cache bottleneck once the scale multiply
    is folded out (queue7 A/B: int8 1.89x from the fold, fp8 only 1.08x) —
    every integer op here costs real tokens/s.

    Two chains, FAT_FP8_DECODE selects (read at trace time); ``magic`` is
    the default since the queue8 A/B measured it **1.29x faster** end-to-end
    at the decode shape (1.27 vs 1.63 ms/step) with observed parity 1.1e-6
    (benchmarks/results/queue8/ab_fp8_magic.log):

    - ``magic`` (default): place the e4m3 bits in a bf16's LOW exponent +
      mantissa — bf16 = (s << 15) | (eeee mmm << 4) reads as
      1.mmm x 2^(e - 127) — and multiply once by 2^120: exactly
      1.mmm x 2^(e - 7), the e4m3 value. e4m3 denormals (e == 0) land on
      bf16 denormals, which the x 2^120 rescales EXACTLY (m x 2^-129 x
      2^120 = m x 2^-9) — provided the VPU doesn't flush bf16 denormal
      multiplier inputs; the all-256-values probe in the TPU queue pins
      this (MEASURED: XLA flushes them even on CPU — denormal payloads
      decode to 0, an error < absmax/28672 of the tile, below e4m3's own
      quantization noise but visible to exact-parity tests). e4m3fn NaN
      (0x7f) decodes to +/-inf. ~8 integer/float ops per element.

    - ``surgery`` (exact): the round-2 chain — build float32 bits
      (sign<<31 | (e+120)<<23 | m<<20), select zero, select exact
      denormals, cast to bf16. Exact everywhere incl. NaN -> large finite;
      ~14 ops per element.

    TPU only legalizes 32-bit shifts (uint16 shifts don't — CLAUDE.md), so
    both chains compute in int32 and narrow at the end.
    """
    if os.environ.get("FAT_FP8_DECODE", "magic") != "surgery":
        bits = pltpu.bitcast(payload, jnp.uint8).astype(jnp.int32)
        h16 = ((bits & 0x80) << 8) | ((bits & 0x7F) << 4)
        return pltpu.bitcast(
            h16.astype(jnp.uint16), jnp.bfloat16
        ) * jnp.bfloat16(2.0 ** 120)
    bits = pltpu.bitcast(payload, jnp.uint8).astype(jnp.int32)
    mag = bits & 0x7F
    sign = (bits & 0x80) << 24
    out = sign | ((mag << 20) + (120 << 23))
    out = jnp.where(mag == 0, sign, out)
    f = pltpu.bitcast(out, jnp.float32)
    # e4m3 denormals (exp==0, mantissa!=0): value = m * 2^-9 exactly.
    denorm = mag < 8
    f = jnp.where(
        denorm,
        mag.astype(jnp.float32)
        * jnp.where(sign != 0, -(2.0 ** -9), 2.0 ** -9),
        f,
    )
    return f.astype(jnp.bfloat16)


def _fp8_e5m2_to_bf16_bits(payload):
    """float8_e5m2 -> bfloat16: shift-only magic chain.

    e5m2 is bf16's low byte in all but exponent bias: place the 7 magnitude
    bits at bf16 bit 5 — the 5 exponent bits land exactly on bf16's low
    exponent field — and rescale by 2^112 to rebias (e5m2 bias 15, bf16
    bias 127). Exact for normals AND denormals (m x 2^-16 lands on bf16
    denormals the x2^112 rescales exactly, modulo the same VPU
    denormal-flush the e4m3 chain documents). e5m2 inf/NaN (exp 31) decode
    to ~2^16-class finite values — quantized payloads never contain them
    (quant.py clamps to +-57344). ~6 integer ops per element vs e4m3
    magic's ~8 (no denormal select needed at all).
    Reference analogue: SURVEY §2.2 N4 names float8_e4m3/e5m2 as the FA3
    TPU payload plan (src/fa3/torch/impl.py:118-133 is fp16 fake-quant).
    """
    bits = pltpu.bitcast(payload, jnp.uint8).astype(jnp.int32)
    h16 = ((bits & 0x80) << 8) | ((bits & 0x7F) << 5)
    return pltpu.bitcast(
        h16.astype(jnp.uint16), jnp.bfloat16
    ) * jnp.bfloat16(2.0 ** 112)


def _convert(payload, compute_dtype):
    """Payload -> compute dtype (fp8 via bit surgery). NO scale multiply:
    per-slot scales fold into scores/p as row vectors (module docstring)."""
    if payload.dtype == jnp.float8_e4m3fn and compute_dtype == jnp.bfloat16:
        return _fp8_e4m3_to_bf16_bits(payload)
    if payload.dtype == jnp.float8_e5m2 and compute_dtype == jnp.bfloat16:
        return _fp8_e5m2_to_bf16_bits(payload)
    return payload.astype(compute_dtype)


def _decode_kernel(
    # scalar prefetch
    page_indices_ref,  # (B * pps_padded,) int32 in SMEM
    lengths_ref,       # (B,) int32 in SMEM
    # pipelined inputs
    q_ref,             # (1, H_kv, G, D) VMEM
    *rest,             # k_0..k_{S-1}, v_0.., [ks_0.., vs_0..,] o, m/l/acc
    softmax_scale,
    page_size,
    pages_per_step,
    h_kv,
    g_pad,
    q_len,
    quantized,
    compute_dtype,
    window=None,
    softcap=None,
    sinks=0,
):
    s_count = pages_per_step
    k_refs = rest[:s_count]
    v_refs = rest[s_count: 2 * s_count]
    off = 2 * s_count
    if quantized:
        ks_refs = rest[off: off + s_count]
        vs_refs = rest[off + s_count: off + 2 * s_count]
        off += 2 * s_count
    else:
        ks_refs = vs_refs = [None] * s_count
    o_ref, m_scr, l_scr, acc_scr = rest[off: off + 4]

    b = pl.program_id(0)
    j = pl.program_id(1)
    n_steps = pl.num_programs(1)

    length = lengths_ref[b]
    n_pages = (length + page_size - 1) // page_size
    # Sliding window: the page walk starts at the first page containing the
    # oldest in-band slot (length - q_len - window + 1); the index maps
    # apply the same shift, so grid step j covers logical page first + j*S+s
    # and the whole walk is O(window) pages, not O(length).
    if window is None:
        first = 0
    else:
        first = jnp.maximum((length - q_len - window + 1) // page_size, 0)
    # StreamingLLM sinks: the walk covers the sink pages FIRST, then the
    # band (skipping any overlap — band_base >= sink_pages).
    sink_pages = -(-sinks // page_size) if (window is not None and sinks) else 0
    band_base = jnp.maximum(first, sink_pages) if sink_pages else first

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Static unroll over (page-of-step, kv head). Each k/v block carries ALL
    # kv heads of one page in a single strided fetch — fetch count is
    # B * pages, not B * pages * H_kv.
    for s in range(s_count):
        t_walk = j * s_count + s
        if sink_pages:
            page_idx = jnp.where(
                t_walk < sink_pages, t_walk,
                band_base + t_walk - sink_pages,
            )
        else:
            page_idx = first + t_walk

        @pl.when(page_idx < n_pages)
        def _update(s=s, page_idx=page_idx):
            slots = page_idx * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (1, page_size), 1
            )
            # Chunked prefill: query row r of a head group is chunk token
            # t = r % q_len at absolute position (length - q_len) + t; it
            # attends to cache slots <= its position (causal — the chunk's
            # own K/V are already appended). q_len == 1 reduces to decode:
            # slots < length.
            row_t = jax.lax.broadcasted_iota(
                jnp.int32, (g_pad, 1), 0
            ) % q_len
            positions = (length - q_len) + row_t          # (g_pad, 1)
            in_range = slots <= positions                  # (g_pad, page)
            if window is not None:
                band = slots > positions - window
                if sinks:
                    band = band | (slots < sinks)
                in_range = in_range & band
            # HIGHEST costs nothing in fp32 debug mode and is ignored for
            # bf16 operands; accumulation is always fp32 (preferred type).
            prec = (
                jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32 else None
            )
            for h in range(h_kv):
                r0, r1 = h * g_pad, (h + 1) * g_pad
                q = q_ref[0, h].astype(compute_dtype) * compute_dtype(
                    softmax_scale
                )
                kf = _convert(k_refs[s][h, 0], compute_dtype)
                vf = _convert(v_refs[s][h, 0], compute_dtype)

                scores = jax.lax.dot_general(
                    q, kf, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (G, page)
                if quantized:
                    # K-scale fold: scores[g, slot] = (q . k_int[slot]) *
                    # k_scale[slot] — (1, page) lane-major row, broadcast
                    # over sublanes (cheap), replacing the per-element
                    # (page, D) dequant multiply.
                    scores = scores * ks_refs[s][h, 0]
                if softcap is not None:
                    # Cap BEFORE masking (tanh saturates mask values).
                    scores = softcap * _softcap_tanh(scores * (1.0 / softcap))
                if window is None:
                    # -inf is exact here: page 0 always holds a valid slot
                    # for every row, so the running max is finite before any
                    # fully-masked page contributes exp(-inf) == 0.
                    scores = jnp.where(in_range, scores, -jnp.inf)
                else:
                    # With a window, a chunk row's first visited pages can
                    # be ENTIRELY below its band (they belong to older
                    # rows' bands): an all--inf page would make
                    # m_prev == m_next == -inf and alpha = exp(nan). Use a
                    # large finite mask value and zero p explicitly — the
                    # dense kernel's pattern (pallas_attn.py _fwd_kernel).
                    scores = jnp.where(in_range, scores, _MASK_VALUE)

                m_prev = m_scr[r0:r1]
                m_curr = jnp.max(scores, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(scores - m_next[:, :1])
                if window is not None:
                    p = jnp.where(in_range, p, 0.0)
                l_scr[r0:r1] = alpha * l_scr[r0:r1] + jnp.sum(
                    p, axis=1, keepdims=True
                )
                m_scr[r0:r1] = m_next
                if quantized:
                    # V-scale fold: acc += sum_slot p[slot] * (vs[slot] *
                    # v_int[slot, :]) == (p * vs_row) @ v_int.
                    pv = p * vs_refs[s][h, 0]
                else:
                    pv = p
                acc_scr[r0:r1] = acc_scr[r0:r1] * alpha[:, :1] + jax.lax.dot(
                    pv.astype(compute_dtype), vf,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

    @pl.when(j == n_steps - 1)
    def _store():
        for h in range(h_kv):
            r0, r1 = h * g_pad, (h + 1) * g_pad
            l = l_scr[r0:r1, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, h] = (acc_scr[r0:r1] / l_safe).astype(o_ref.dtype)


def _convert_block(ref, compute_dtype):
    """Convert a WHOLE page block — all KV heads at once: (H_kv, page, D).

    One 3-D VPU pass per page (astype, or the fp8 bit surgery); feeds the
    merged kernel's contiguous K/V scratch. Scales are NOT applied here —
    they fold into scores/p as lane-major row vectors (module docstring).
    """
    return _convert(ref[:, 0], compute_dtype)


def _decode_kernel_merged(
    # scalar prefetch
    page_indices_ref,  # (B * pps_padded,) int32 in SMEM
    lengths_ref,       # (B,) int32 in SMEM
    # pipelined inputs
    q_ref,             # (1, H_kv, G, D) VMEM
    *rest,             # k_0..k_{S-1}, v_0.., [ks_0.., vs_0..,] o, scratches
    softmax_scale,
    page_size,
    pages_per_step,
    h_kv,
    g_pad,
    q_len,
    quantized,
    compute_dtype,
    window=None,
    softcap=None,
    sinks=0,
    int8_mxu=None,
    ablate=None,
):
    """Step-merged decode: one online-softmax update per (head, STEP).

    The flat kernel issues pages_per_step * h_kv tiny score matmuls and as
    many m/l/acc rescales per grid step — at decode shapes each op touches
    a sub-native-tile (g_pad x page) plane and per-op dispatch dominates
    (measured: bf16 decode at 27% of HBM line rate, decode_r02.json). Here
    each step first lands its S pages in a CONTIGUOUS (h_kv, S*page, D)
    VMEM scratch (one all-heads dequant store per page — sublane offsets
    are page-multiples, Mosaic-legal), then runs ONE (g_pad, D)x(D, S*page)
    score matmul and ONE masked online update per head. VPU element count
    is unchanged; dispatch count per step drops ~8x. Validity needs no
    per-page predicate: a slot is masked iff slot > its row's position
    (positions < length bound every in-range slot), so steps fully past a
    short sequence contribute exp-of-masked == 0 via the same mask.
    """
    s_count = pages_per_step
    k_refs = rest[:s_count]
    v_refs = rest[s_count: 2 * s_count]
    off = 2 * s_count
    if quantized:
        ks_refs = rest[off: off + s_count]
        vs_refs = rest[off + s_count: off + 2 * s_count]
        off += 2 * s_count
    else:
        ks_refs = vs_refs = [None] * s_count
    (o_ref, m_scr, l_scr, acc_scr, kc_scr, vc_scr) = rest[off: off + 6]

    b = pl.program_id(0)
    j = pl.program_id(1)
    n_steps = pl.num_programs(1)

    length = lengths_ref[b]
    if window is None:
        first = 0
    else:
        first = jnp.maximum((length - q_len - window + 1) // page_size, 0)
    sink_pages = -(-sinks // page_size) if (window is not None and sinks) else 0
    band_base = jnp.maximum(first, sink_pages) if sink_pages else first

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if ablate == "noconvert":
            # Measurement-only arm (FAT_PAGED_ABLATE, scripts/tpu_queue18):
            # the landing/convert stores below are skipped, so zero the
            # scratch once to keep the arithmetic finite. Output is wrong
            # BY DESIGN; only the timing is read.
            kc_scr[...] = jnp.zeros_like(kc_scr)
            vc_scr[...] = jnp.zeros_like(vc_scr)

    # Land the step's pages contiguously: kc/vc hold S*page slots per head.
    # int8-MXU paths (int8_mxu in {None, "full", "qk"}): the K scratch keeps
    # the RAW int8 payloads (v5e's MXU is int8-native at 2x bf16 peak) — no
    # per-element K convert at all; q quantizes per row instead (head loop).
    # "full" also keeps V raw (p re-quantizes per row); "qk" converts V with
    # ONE cheap s8->bf16 astype and keeps p in bf16 — the decode analogue of
    # the FA3 hybrid-PV verdict (pallas_fp8._int8_pv_s8: the p-requant VPU
    # chain serializes against the MXU and measured slower).
    for s in range(s_count if ablate != "noconvert" else 0):
        if int8_mxu:
            kc_scr[:, s * page_size: (s + 1) * page_size, :] = k_refs[s][:, 0]
        else:
            kc_scr[:, s * page_size: (s + 1) * page_size, :] = _convert_block(
                k_refs[s], compute_dtype
            )
        if int8_mxu == "full":
            vc_scr[:, s * page_size: (s + 1) * page_size, :] = v_refs[s][:, 0]
        else:
            vc_scr[:, s * page_size: (s + 1) * page_size, :] = _convert_block(
                v_refs[s], compute_dtype
            )
    if quantized:
        # Per-slot scale rows for the whole step, lane-major: (H_kv, width).
        ks_row = jnp.concatenate(
            [r[:, 0, 0, :] for r in ks_refs], axis=1
        )
        vs_row = jnp.concatenate(
            [r[:, 0, 0, :] for r in vs_refs], axis=1
        )

    width = s_count * page_size
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    if sink_pages:
        # The sink->band jump breaks column contiguity: slot bases are
        # selected per page chunk (statically unrolled, s_count terms).
        slots = jnp.zeros((1, width), jnp.int32)
        for s in range(s_count):
            t_walk = j * s_count + s
            pidx = jnp.where(
                t_walk < sink_pages, t_walk,
                band_base + t_walk - sink_pages,
            )
            in_chunk = (cols // page_size) == s
            slots = jnp.where(
                in_chunk, pidx * page_size + (cols - s * page_size), slots
            )
    else:
        # Consecutive logical pages -> consecutive slots: col c of the
        # scratch is absolute slot (first + j*S)*page + c.
        slots = (first + j * s_count) * page_size + cols
    row_t = jax.lax.broadcasted_iota(jnp.int32, (g_pad, 1), 0) % q_len
    positions = (length - q_len) + row_t              # (g_pad, 1)
    in_range = slots <= positions                     # (g_pad, width)
    if window is not None:
        band = slots > positions - window
        if sinks:
            band = band | (slots < sinks)
        in_range = in_range & band
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32 else None
    )
    for h in range(h_kv if ablate != "onehead" else 1):
        r0, r1 = h * g_pad, (h + 1) * g_pad
        if int8_mxu:
            # Quantize q per ROW (g_pad x d — tiny vs the width x d cache):
            # q ~= q8 * qs; scores = (q8 . k8) * qs * ks * softmax_scale,
            # all scale folds on (g_pad, width) planes. Noise added: ~0.4%
            # per q element — same class the int8 CACHE already injects.
            qf = q_ref[0, h].astype(jnp.float32)
            qs = jnp.maximum(
                jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-9
            ) * (1.0 / 127.0)
            q8 = jnp.round(qf / qs).astype(jnp.int8)
            scores = jax.lax.dot_general(
                q8, kc_scr[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            scores = scores * (qs * softmax_scale) * ks_row[h:h + 1, :]
        else:
            q = q_ref[0, h].astype(compute_dtype) * compute_dtype(
                softmax_scale
            )
            scores = jax.lax.dot_general(
                q, kc_scr[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (g_pad, width)
            if quantized:
                # K-scale fold (module docstring): (1, width) row broadcast
                # over g_pad sublanes instead of a (width, D) dequant
                # multiply.
                scores = scores * ks_row[h:h + 1, :]
        if softcap is not None:
            scores = softcap * _softcap_tanh(scores * (1.0 / softcap))
        # Unlike the flat kernel, a whole step CAN be past a short
        # sequence (no per-page predicate), making every column masked:
        # use the finite mask value + explicit p zeroing unconditionally
        # so alpha never sees exp(-inf - -inf).
        scores = jnp.where(in_range, scores, _MASK_VALUE)

        m_prev = m_scr[r0:r1]
        m_curr = jnp.max(scores, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(scores - m_next[:, :1])
        p = jnp.where(in_range, p, 0.0)
        l_scr[r0:r1] = alpha * l_scr[r0:r1] + jnp.sum(
            p, axis=1, keepdims=True
        )
        m_scr[r0:r1] = m_next
        if int8_mxu == "full":
            # pv >= 0; pv ~= p8 * ps per row, acc += (p8 . v8) * ps with
            # the per-slot v scales already folded into pv.
            pv = p * vs_row[h:h + 1, :]
            ps = jnp.maximum(
                jnp.max(pv, axis=1, keepdims=True), 1e-30
            ) * (1.0 / 127.0)
            p8 = jnp.round(pv / ps).astype(jnp.int8)
            contrib = jax.lax.dot(
                p8, vc_scr[h], preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ps
            acc_scr[r0:r1] = acc_scr[r0:r1] * alpha[:, :1] + contrib
        else:
            if quantized:
                # V-scale fold: (p * vs_row) @ v_int == p @ (vs * v_int).
                pv = p * vs_row[h:h + 1, :]
            else:
                pv = p
            acc_scr[r0:r1] = acc_scr[r0:r1] * alpha[:, :1] + jax.lax.dot(
                pv.astype(compute_dtype), vc_scr[h],
                preferred_element_type=jnp.float32,
                precision=prec,
            )

    @pl.when(j == n_steps - 1)
    def _store():
        for h in range(h_kv):
            r0, r1 = h * g_pad, (h + 1) * g_pad
            l = l_scr[r0:r1, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, h] = (acc_scr[r0:r1] / l_safe).astype(o_ref.dtype)


def pallas_paged_attention(
    q: jax.Array,              # (B, H, D) one query token per sequence
    k_pages: jax.Array,        # (H_kv, P, page, D) payload
    v_pages: jax.Array,
    page_indices: jax.Array,   # (B, pages_per_seq) int32
    lengths: jax.Array,        # (B,) int32
    *,
    k_scales: jax.Array | None = None,  # (H_kv, P, page, 1) fp32
    v_scales: jax.Array | None = None,
    softmax_scale: float | None = None,
    pages_per_step: int | None = None,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    window: int | None = None,
    merged: bool | None = None,
    softcap: float | None = None,
    sinks: int = 0,
) -> jax.Array:
    """Paged attention on TPU: decode (q: (B, H, D), one token per sequence)
    or chunked prefill (q: (B, H, T, D) — the chunk's K/V must already be
    appended to the cache and ``lengths`` includes the chunk; rows attend
    causally to their absolute positions). Returns o in q's shape/dtype.

    GQA: H % H_kv == 0; query heads are grouped per KV head. Quantized caches
    pass per-slot fp32 scales (both or neither of k_scales/v_scales).
    ``pages_per_step`` batches several pages per grid step to amortize
    pipeline overhead; default targets >= 512 tokens per step.

    ``window``: sliding-window attention — each row attends only to its
    last ``window`` slots. The page walk starts at the window's first page
    (per-sequence, resolved from the scalar-prefetched length inside the
    index maps) and the grid shrinks to the band size, so both DMA and
    compute are O(window) per sequence instead of O(length).

    ``merged``: step-merged schedule (_decode_kernel_merged) — contiguous
    per-step K/V scratch, one score matmul + one online update per (head,
    step) instead of per (head, page); targets the small-op dispatch
    overhead that holds decode under HBM line rate. None reads
    FAT_PAGED_MERGED (default ON since round 3: same-window A/B measured
    merged 3.27x faster at the decode_r02 shape, and the 6.1e-5 merged-vs-
    flat delta was adjudicated as accumulation-order — flat and merged sit
    at the SAME distance from the fp32 gather oracle; RESULTS.md round 3).
    Requires page_size % 16 == 0 (scratch-store sublane alignment) — falls
    back to the flat schedule otherwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    decode = q.ndim == 3
    if decode:
        q = q[:, :, None, :]
    b, h_q, q_len, d = q.shape
    h_kv, n_pages_total, page_size, d_k = k_pages.shape
    if d != d_k:
        raise ValueError(f"head_dim mismatch: q has {d}, cache has {d_k}")
    if h_q % h_kv != 0:
        raise ValueError(f"H={h_q} must be a multiple of H_kv={h_kv}")
    groups = h_q // h_kv
    pages_per_seq = page_indices.shape[1]
    quantized = k_scales is not None
    if quantized != (v_scales is not None):
        raise ValueError("pass both k_scales and v_scales, or neither")
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    # pages_per_step default is PAYLOAD-PATH-AWARE (queue12/decode_ablate_v2,
    # all arms interleaved in one window): int8-qk peaks at a 4-page step
    # (92,987 tok/s vs 69,408 at 8) while bf16 peaks at 8 (82,957 vs 51,034
    # at 4) — i.e. the quantized winner beats bf16's own best arm 1.12x at
    # each path's preferred step width. fp8 also prefers 8 (49.8k vs 40.1k).
    # The DEFAULT engages only where it was MEASURED: the bf16-compute
    # DECODE fast path (q_len == 1; chunked prefill / spec-verify chunks
    # keep the convert path — q-row-quant noise would compound through
    # every prefill layer and the 4-page step is decode-tuned) on
    # merged-capable page sizes. fp32 compute is the exactness/debug path.
    # An EXPLICIT env setting is honored at any shape/dtype (the A/B and
    # parity harnesses set it deliberately).
    _mxu_env = os.environ.get("FAT_PAGED_INT8_MXU")
    if _mxu_env is None:
        _mxu_env = (
            "qk" if (compute_dtype == jnp.bfloat16 and q_len == 1
                     and page_size % 16 == 0) else "0"
        )
    # Resolve the mode ONCE; the pps default below and the kernel dispatch
    # (int8_mxu) must never disagree.
    _mxu_mode = (
        {"1": "full", "full": "full", "qk": "qk"}.get(_mxu_env)
        if quantized and k_pages.dtype == jnp.int8 else None
    )
    # TENTATIVE step width: the 4-page step is tuned for the MERGED
    # int8-qk kernel specifically; whether merged actually engages is
    # decided by the VMEM gate below, so a defaulted pps is re-derived
    # after that decision (ADVICE r4) — an explicit pages_per_step (arg
    # or FAT_PAGED_PPS at the caller) is always honored as-is.
    pps_defaulted = pages_per_step is None
    if pps_defaulted:
        pages_per_step = max(
            1, (256 if _mxu_mode == "qk" else 512) // page_size
        )
    s_count = max(1, min(pages_per_step, pages_per_seq))

    # Row layout: row = g * q_len + t, padded UP to an fp32 sublane multiple
    # (not just a minimum of 8): every per-head scratch slice
    # m_scr[h*g_pad:(h+1)*g_pad] must start at an 8-aligned sublane offset or
    # Mosaic relayouts (or refuses) the slice on real TPU.
    rows = groups * q_len
    g_pad = max(8, -(-rows // 8) * 8)
    q4 = q.reshape(b, h_kv, rows, d)
    if g_pad != rows:
        q4 = jnp.pad(q4, [(0, 0), (0, 0), (0, g_pad - rows), (0, 0)])

    if merged is None:
        merged = os.environ.get("FAT_PAGED_MERGED", "1") == "1"
    if merged and page_size % 16 != 0:
        merged = False  # scratch stores need sublane-aligned page offsets
    if merged:
        # TOTAL-VMEM gate (the resident-dQ lesson, pallas_attn vmem_est):
        # budget scratches + double-buffered pipeline blocks, not just the
        # merged kernel's extra kc/vc scratch. At chunked-prefill shapes
        # (q_len=256, H_kv=8, d=128, page=64) the merged kernel's scoped
        # allocation reads 16.26M vs the 16M limit and the REMOTE compile
        # fails (queue5/verify_sinks_chunked_prefill.log — interpret-mode
        # tests never see it). Fall back to the flat schedule over budget.
        payload_b = jnp.dtype(k_pages.dtype).itemsize
        comp_b = jnp.dtype(compute_dtype).itemsize
        est = (
            # q + out blocks (bf16-class), double-buffered
            2 * 2 * (h_kv * g_pad * d * q4.dtype.itemsize)
            # k/v pipeline: s_count blocks each, double-buffered
            + 2 * 2 * s_count * h_kv * page_size * d * payload_b
            # per-slot scale blocks ride the same pipeline when quantized
            + (2 * 2 * s_count * h_kv * page_size * 4 if quantized else 0)
            # m/l (fp32, LANES wide) + acc (fp32, d wide)
            + 2 * h_kv * g_pad * 128 * 4
            + h_kv * g_pad * d * 4
            # merged-only contiguous K/V scratch
            + 2 * h_kv * s_count * page_size * d * comp_b
            # merged-only live (g_pad, width) fp32 planes on the kernel
            # stack: scores, p, in_range/mask — the wide-step schedule's
            # real extra footprint vs the flat kernel's (g_pad, page)
            + 4 * g_pad * (s_count * page_size) * 4
        )
        if est > 14 * 1024 * 1024:
            merged = False

    # int8-MXU paths (merged only): raw s8xs8->s32 matmuls on the
    # int8-native v5e MXU; no per-element K dequant (module docstring).
    # Modes (FAT_PAGED_INT8_MXU): "0" off (convert path), "full" (or the
    # legacy "1") runs BOTH matmuls in s8 (p re-quantizes per row), "qk"
    # runs only QK in s8 and converts V once for a bf16 PV (no p-requant
    # chain — the hybrid the FA3 int8 kernel defaulted to, pallas_fp8).
    # Adds q(/p) row-quantization noise of the same class the int8 cache
    # already carries (~9e-3 vs the gather oracle, pinned in
    # tests/test_serving.py). "full" MEASURED SLOWER at decode shapes —
    # queue8 A/B: 1.137 vs 0.910 ms (the g_pad=8-row matmuls underutilize
    # the MXU, and the q/p row-quant VPU work costs more than int8->f32
    # astype). "qk" is the DEFAULT since round 4: with its preferred
    # 4-page step it is the first quantized decode to beat bf16 outright
    # (92,987 vs 82,957 tok/s, both at their best arms —
    # queue12/decode_ablate_v2, VERDICT r3 item 1 done-criterion).
    int8_mxu = _mxu_mode if merged else None
    # Measurement-only kernel ablations (merged kernel, timing attribution
    # for queue18 — outputs are WRONG under these; never set in serving):
    # "noconvert" skips the landing/convert stores, "onehead" runs one
    # head's update. Read at trace time like every FAT_* knob.
    _ablate = os.environ.get("FAT_PAGED_ABLATE") or None
    if _ablate and not merged:
        # The ablation arms exist only in the merged kernel. Silently
        # timing the unmodified flat path here would record a "stage
        # costs nothing" delta into the attribution artifact (ADVICE r5)
        # — fail loud instead; the arm's shape must keep merged engaged.
        raise ValueError(
            f"FAT_PAGED_ABLATE={_ablate!r} requires the merged kernel, "
            f"but it is disabled at this shape (page_size={page_size}, "
            "VMEM gate) — the ablation arm would silently time the "
            "unmodified flat path"
        )
    if pps_defaulted and int8_mxu != "qk" and _mxu_mode == "qk":
        # Merged int8-qk was the basis for the 4-page default but the
        # VMEM/page-size gate disabled merged — the flat convert path's
        # measured-best is the 8-page step (queue12/decode_ablate_v2).
        pages_per_step = max(1, 512 // page_size)
        s_count = max(1, min(pages_per_step, pages_per_seq))

    # Pad the page table so every grid step has s_count entries; edge-pad so
    # the padded slots re-point at an already-resident page (no extra fetch).
    n_steps = -(-pages_per_seq // s_count)
    if window is not None:
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        # The band spans window + q_len - 1 slots -> at most that many
        # pages + 1 for straddle; the walk starts at the band's first page.
        band_pages = -(-(window + q_len - 1) // page_size) + 1
        if sinks:
            band_pages += -(-sinks // page_size)
        n_steps = min(n_steps, -(-band_pages // s_count))
    pps_pad = max(n_steps * s_count, pages_per_seq)
    pi = page_indices
    if pps_pad != pages_per_seq:
        pi = jnp.pad(pi, [(0, 0), (0, pps_pad - pages_per_seq)], mode="edge")

    kernel = functools.partial(
        _decode_kernel_merged if merged else _decode_kernel,
        softmax_scale=float(softmax_scale),
        page_size=page_size,
        pages_per_step=s_count,
        h_kv=h_kv,
        g_pad=g_pad,
        q_len=q_len,
        quantized=quantized,
        compute_dtype=compute_dtype,
        window=window,
        softcap=float(softcap) if softcap is not None else None,
        sinks=int(sinks),
        **({"int8_mxu": int8_mxu} if int8_mxu else {}),
        **({"ablate": _ablate} if (_ablate and merged) else {}),
    )

    def idx_q(b_, j, pi_, ln):
        return (b_, 0, 0, 0)

    sink_pages_static = (
        -(-sinks // page_size) if (window is not None and sinks) else 0
    )

    def idx_page(s):
        def f(b_, j, pi_, ln):
            # Block covers ALL kv heads of one page (dim 0 = full H_kv).
            t_walk = j * s_count + s
            logical = t_walk
            if window is not None:
                # Start the walk at the band's first page (same arithmetic
                # as the kernel's ``first``); with sinks the walk covers
                # the sink pages first, then the band. Steps past the
                # sequence's last page clamp to it, so their block index
                # repeats and Pallas skips the re-fetch.
                first = jnp.maximum(
                    (ln[b_] - q_len - window + 1) // page_size, 0
                )
                last = jnp.maximum(
                    (ln[b_] + page_size - 1) // page_size - 1, 0
                )
                if sink_pages_static:
                    base = jnp.maximum(first, sink_pages_static)
                    logical = jnp.where(
                        t_walk < sink_pages_static, t_walk,
                        base + t_walk - sink_pages_static,
                    )
                else:
                    logical = first + t_walk
                logical = jnp.minimum(logical, last)
            return (0, pi_[b_ * pps_pad + logical], 0, 0)
        return f

    def page_spec(s):
        return pl.BlockSpec((h_kv, 1, page_size, d), idx_page(s))

    def scale_spec(s):
        # Lane-major: page slots on the LANE dim (see module docstring).
        return pl.BlockSpec((h_kv, 1, 1, page_size), idx_page(s))

    in_specs = [pl.BlockSpec((1, h_kv, g_pad, d), idx_q)]
    in_specs += [page_spec(s) for s in range(s_count)]
    in_specs += [page_spec(s) for s in range(s_count)]
    args = [q4]
    args += [k_pages] * s_count
    args += [v_pages] * s_count
    if quantized:
        # Public scale layout is (H_kv, P, page, 1); transpose ONCE here to
        # lane-major (H_kv, P, 1, page) — 4 bytes/slot, ~us — so in-kernel
        # scale rows never live on a size-1 lane dim (Mosaic slow path;
        # decode_r03.json's 2.3x quantized slowdown).
        ks_t = jnp.swapaxes(k_scales, 2, 3)
        vs_t = jnp.swapaxes(v_scales, 2, 3)
        in_specs += [scale_spec(s) for s in range(s_count)]
        in_specs += [scale_spec(s) for s in range(s_count)]
        args += [ks_t] * s_count
        args += [vs_t] * s_count

    scratch_shapes = [
        pltpu.VMEM((h_kv * g_pad, 128), jnp.float32),
        pltpu.VMEM((h_kv * g_pad, 128), jnp.float32),
        pltpu.VMEM((h_kv * g_pad, d), jnp.float32),
    ]
    if merged:
        k_scr_dtype = jnp.int8 if int8_mxu else compute_dtype
        v_scr_dtype = jnp.int8 if int8_mxu == "full" else compute_dtype
        scratch_shapes += [
            pltpu.VMEM((h_kv, s_count * page_size, d), k_scr_dtype),
            pltpu.VMEM((h_kv, s_count * page_size, d), v_scr_dtype),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_kv, g_pad, d), idx_q),
        scratch_shapes=scratch_shapes,
    )

    o = _softcap_launch(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_kv, g_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    ), interpret, pi.reshape(-1), lengths, *args)
    o = o[:, :, :rows, :].reshape(b, h_q, q_len, d)
    return o[:, :, 0, :] if decode else o
