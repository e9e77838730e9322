"""FA3: fused FP8 flash-attention forward (Pallas TPU kernel).

The TPU-native re-design of the reference's FA3 fp8 path
(src/fa3/torch/impl.py:118-133 + csrc/fa3/fa3_fwd.cu:30-101): real
``float8_e4m3fn`` tile payloads with per-(head, seq-block) fp32 descales
fused into the attention kernel, instead of the reference's fp16 fake
quant-dequant pre-pass.

Why this shape on v5e: the MXU computes in bf16, so FP8's win on this chip
is HBM bandwidth — Q/K/V stream from HBM at 1 byte/elem (half of bf16) and
are upcast in VMEM right before the matmuls. The descale is one scalar
multiply per (q-tile, kv-tile) pair, folded into the existing score scaling,
so the FP8 path adds zero per-element VPU work.

LSE semantics under quantization: computed on the quantized scores, compared
against a quantized-input oracle — the well-defined version of the
reference's unsatisfiable fp8 LSE check (bug B6, SURVEY.md §2.6).

Backward: straight-through estimator — gradients flow as if the kernel had
consumed the dequantized inputs (the bf16 backward kernels run on
dequantized q/k/v). This matches the reference's C++ fa3_bwd.cu:134-146,
which re-quantizes and runs the FA1 backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.pallas_attn import (
    LANES,
    _alibi_tile_bias,
    _causal_needs_mask,
    _causal_should_run,
    _combined_mask,
    _flash_bwd,
    _flash_fwd,
    _interpret_default,
    _keep_mask,
    _softcap_launch,
    _softcap_tanh,
    _pad_dim,
    _seg_layouts,
)
from flashattention_tpu.ops.quant import FP8_DTYPE, FP8_MAX, SCALE_EPS
from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE

def _ste_original() -> bool:
    """STE gradient flavor (FAT_STE_GRADS, read at TRACE time): "dequant"
    (default) = backward on dequantized payloads (reference
    fa3_bwd.cu:134-146 semantics); "original" = classic straight-through
    (backward on the original inputs — no dequant pass in the grad path).
    See the fwd rule's residual note."""
    import os

    return os.environ.get("FAT_STE_GRADS", "dequant") == "original"


def _int8_pv_s8() -> bool:
    """int8 PV strategy (FAT_INT8_PV, read at trace time): "bf16" (default)
    converts the v tile with a single cheap s8->bf16 astype and keeps p in
    bf16 — no p re-quantization chain; "s8" re-quantizes p per row and runs
    the PV matmul on the int8 MXU. queue9 measured the s8 PV fused kernel
    at 112.9 TF vs bf16's 137.3 at the compute-bound headline shape — the
    p-requant VPU chain serializes against the MXU exactly like the softmax
    max chain the VPU-roofline ablation identified (RESULTS.md round 3)."""
    import os

    return os.environ.get("FAT_INT8_PV", "bf16") == "s8"


def quantize_tiles(x: jax.Array, block: int, fmt: str = "fp8"):
    """(B, H, N, D) fp -> (payload fp8|int8, scales fp32 (B, H, N//block)).
    N must already be padded to a multiple of ``block``. Thin alias of
    quant.quantize_{fp8,int8}_blocks so the kernel path and the
    parity-test path share one quantization definition."""
    from flashattention_tpu.ops.quant import (
        quantize_e5m2_blocks, quantize_fp8_blocks, quantize_int8_blocks,
    )

    if fmt == "int8":
        return quantize_int8_blocks(x, block)
    if fmt == "e5m2":
        return quantize_e5m2_blocks(x, block)
    return quantize_fp8_blocks(x, block)


def _fp8_fwd_kernel(
    *refs,
    softmax_scale, causal, n_q, n_k, block_q, block_k, groups,
    dropout_rate, window=None, sinks=0, int8_payload=False,
    segmented=False, softcap=None, alibi=False, cache_kv=False,
):
    # Ref layout: [sq, sk, sv, seed, (slopes)] scalar-prefetch in SMEM,
    # then [(qseg, kseg)], q, k, v, outputs, scratch — mirrors the
    # args/in_specs assembly in _fp8_fwd (feature parity with the bf16
    # kernel's _unpack_refs groups; VERDICT r3 item 7).
    refs = list(refs)
    sq_ref = refs.pop(0)
    sk_ref = refs.pop(0)
    sv_ref = refs.pop(0)
    seed_ref = refs.pop(0)
    slopes_ref = refs.pop(0) if alibi else None
    if segmented:
        qseg_ref = refs.pop(0)
        kseg_ref = refs.pop(0)
    else:
        qseg_ref = kseg_ref = None
    (q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
     *cache_scr) = refs
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv_tiles = pl.num_programs(3)
    offset = n_k - n_q
    kv_edge = n_k % block_k != 0
    hk = hi // groups  # KV head for this query head (GQA; == hi when groups=1)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Lagged-max frame, ported from the bf16 kernel (round 4): the 11.6%
    # forward win (queue11/ab_lagged_inproc) applies equally here — the
    # int8 fused kernel runs at EVERY shape (auto mode) and serializes the
    # same rowmax -> exp -> PV chain. Same env knob, read at trace time.
    from flashattention_tpu.ops.pallas_attn import _lagged_env as _le

    # Same soundness gate as the bf16 kernel (round 5): ALiBi climbs the
    # per-tile rowmax by slope * block_k — beyond the lagged frame's +60
    # clamp — and softcap bounds the climb by 2*cap.
    lagged_env = _le() and not alibi and (softcap is None or softcap <= 30.0)

    from flashattention_tpu.ops.pallas_paged import (
        _fp8_e4m3_to_bf16_bits,
        _fp8_e5m2_to_bf16_bits,
    )

    def _decode(ref_val):
        if ref_val.dtype == jnp.float8_e5m2:
            return _fp8_e5m2_to_bf16_bits(ref_val)
        return _fp8_e4m3_to_bf16_bits(ref_val)

    # Decode-once cache (mode="fused_cached"): the plain fused kernel
    # bit-decodes every K/V tile once PER Q TILE — O(N_q/bq) redundant VPU
    # work that is the measured ~20% tax making "predecode" win at
    # compute-bound shapes (RESULTS.md r3). Here each K/V tile is decoded
    # on its FIRST VISIT into a whole-row VMEM scratch (and q once per q
    # row), so the decode tax drops from O(n_q_tiles * N_k) to O(N_k) per
    # (b, h) while K/V still stream from HBM at 1 byte/elem. First visit
    # for tile ik = the smallest iq whose (iq, ik) tile runs; with causal/
    # window bands the run-set per ik is contiguous in iq, so
    # `run & ~run(iq-1)` identifies it exactly (sinks tiles run at iq=0).
    if cache_kv:
        qc_scr, kc_scr, vc_scr = cache_scr

        if causal:
            _run_now = _causal_should_run(iq, ik, block_q, block_k, offset,
                                          window, sinks)
            _ran_prev = _causal_should_run(jnp.maximum(iq - 1, 0), ik,
                                           block_q, block_k, offset,
                                           window, sinks)
            fv = _run_now & ((iq == 0) | jnp.logical_not(_ran_prev))
        else:
            fv = iq == 0

        @pl.when(ik == 0)
        def _fill_q():
            qc_scr[...] = _decode(q_ref[0, 0])

        @pl.when(fv)
        def _fill_kv():
            off = pl.multiple_of(ik * block_k, block_k)
            kc_scr[pl.ds(off, block_k), :] = _decode(k_ref[0, 0])
            vc_scr[pl.ds(off, block_k), :] = _decode(v_ref[0, 0])

    def _cached_q():
        return qc_scr[...]

    def _cached_k():
        off = pl.multiple_of(ik * block_k, block_k)
        return kc_scr[pl.ds(off, block_k), :]

    def _cached_v():
        off = pl.multiple_of(ik * block_k, block_k)
        return vc_scr[pl.ds(off, block_k), :]

    def _update(use_mask, lagged_tile=False):
        if int8_payload:
            # int8 payloads hit the MXU RAW: s8xs8->s32 is native on v5e
            # (394 TOPS = 2x bf16 peak) and EXACT — no convert chain at
            # all, the descale scalar folds into the score scaling.
            s = jax.lax.dot_general(
                q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            # Upcast fp8 tiles in VMEM via integer bit surgery (v5e has no
            # fp8 MXU and its native fp8 cast is slow — see pallas_paged);
            # the FP8 win here is halved HBM traffic, MXU runs bf16.
            if cache_kv:
                q, k = _cached_q(), _cached_k()
            else:
                q = _decode(q_ref[0, 0])
                k = _decode(k_ref[0, 0])
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # Fused descale: sq * sk folds into the softmax scale multiply.
        descale = sq_ref[bi, hi, iq] * sk_ref[bi, hk, ik]
        s = s * (descale * softmax_scale)
        if alibi:
            s = s + _alibi_tile_bias(slopes_ref, hi, iq, ik, block_q,
                                     block_k, offset)
        if softcap is not None:
            # Same placement as the bf16 kernel: cap the (descaled) scores
            # BEFORE masking — tanh saturates the mask value. Impl picked
            # by FAT_SOFTCAP_IMPL (pallas_attn._softcap_tanh).
            s = jnp.float32(softcap) * _softcap_tanh(
                s * jnp.float32(1.0 / softcap)
            )
        mask = _combined_mask(use_mask, segmented, qseg_ref, kseg_ref,
                              iq, ik, block_q, block_k, n_q, n_k, causal,
                              offset, window, sinks)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        if lagged_env and lagged_tile:
            # Compute p in the frame of the PREVIOUS tiles' running max —
            # removes the rowmax reduce from p's critical path so it
            # co-issues with the PV matmul (full rationale: the bf16
            # kernel's lagged branch, pallas_attn._fwd_kernel). Identical
            # math; identical finite-frame fallback and +60 clamp.
            frame = jnp.where(m_prev < -1e30, 0.0, m_prev)
            p = jnp.exp(jnp.minimum(s - frame[:, :1], 60.0))
            if mask is not None:
                p = jnp.where(mask, p, 0.0)
            sum_p = jnp.sum(p, axis=1, keepdims=True)  # pre-dropout l
            if dropout_rate > 0.0:
                bh = bi * pl.num_programs(1) + hi
                keep = _keep_mask(
                    seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
                )
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
            pv = _pv_matmul(p)
            acc_mid = acc_scr[...] + pv * sv_ref[bi, hk, ik]
            m_curr = jnp.max(s, axis=1, keepdims=True)   # off p's path
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(jnp.minimum(frame - m_next, 60.0))
            l_scr[...] = (l_prev + sum_p) * alpha
            acc_scr[...] = acc_mid * alpha[:, :1]
            m_scr[...] = m_next
            return

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        if mask is not None:
            # Exact zeroing: rows with no valid keys otherwise contribute
            # p == 1 garbage (see pallas_attn fwd note).
            p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        if dropout_rate > 0.0:
            # Counter-based replay, identical formula to the bf16 kernels
            # (pallas_attn._keep_mask) so the STE backward regenerates the
            # exact mask; applied AFTER l/m (LSE stays pre-dropout).
            bh = bi * pl.num_programs(1) + hi
            keep = _keep_mask(
                seed_ref[0], bh, iq, ik, block_q, block_k, dropout_rate,
            )
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)

        acc_scr[...] = acc_scr[...] * alpha[:, :1] + _pv_matmul(p) * sv_ref[
            bi, hk, ik
        ]

    def _pv_matmul(p):
        """p @ V for one tile (NO descale — the sv scalar multiplies the
        returned (bq, d) contribution at the acc update)."""
        if int8_payload and _int8_pv_s8():
            # Quantize p per ROW (p >= 0, rows O(1)): pv = (p8 . v8) * ps,
            # v's per-tile descale folds below with ps. Noise ~0.4% per p
            # element — the same class the int8 payloads already carry.
            ps = jnp.maximum(
                jnp.max(p, axis=1, keepdims=True), 1e-30
            ) * (1.0 / 127.0)
            p8 = jnp.round(p / ps).astype(jnp.int8)
            return jax.lax.dot(
                p8, v_ref[0, 0], preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ps
        if int8_payload:
            # Hybrid PV (FAT_INT8_PV=bf16, default): int8->bf16 astype is
            # ONE cheap pass (unlike e4m3's bit surgery) and drops the
            # 3-pass p re-quant chain + its ~0.4% noise; QK stays raw s8.
            return jax.lax.dot(
                p.astype(jnp.bfloat16), v_ref[0, 0].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return jax.lax.dot(
            p.astype(jnp.bfloat16),
            _cached_v() if cache_kv else _decode(v_ref[0, 0]),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # Sliding window + sinks tile dispatch is shared with the bf16
        # kernels: tiles wholly outside the band (and past the sinks) are
        # skipped — O(N*(W+S)) work, same as pallas_attn._fwd_kernel.
        run = _causal_should_run(iq, ik, block_q, block_k, offset,
                                 window, sinks)
        needs_mask = _causal_needs_mask(iq, ik, block_q, block_k, offset,
                                        window, sinks)
        if kv_edge:
            needs_mask = needs_mask | (ik == n_kv_tiles - 1)

        if lagged_env:
            # First VISITED tile takes the standard path so the frame is a
            # true rowmax (see pallas_attn._fwd_kernel's lagged dispatch).
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
        is_edge = ik == n_kv_tiles - 1
        if lagged_env:
            for use_mask in (True, False):
                mask_pred = is_edge if use_mask else (
                    jnp.logical_not(is_edge)
                )
                for is_first in (True, False):
                    first_pred = (ik == 0) if is_first else (ik != 0)

                    @pl.when(mask_pred & first_pred)
                    def _br2(use_mask=use_mask, is_first=is_first):
                        _update(use_mask, lagged_tile=not is_first)
        else:
            @pl.when(is_edge)
            def _edge():
                _update(True)

            @pl.when(jnp.logical_not(is_edge))
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


def _fp8_fwd(
    q8, k8, v8, sq, sk, sv, *, causal, softmax_scale, block_q, block_k,
    out_dtype, interpret, n_q, n_k, stages=2, seed=None, dropout_rate=0.0,
    window=None, sinks=0, q_seg=None, kv_seg=None, softcap=None,
    slopes=None, cache_kv=False,
):
    b, h, n_q_pad, d = q8.shape
    h_kv = k8.shape[1]
    groups = h // h_kv
    n_k_pad = k8.shape[2]
    grid = (b, h, n_q_pad // block_q, n_k_pad // block_k)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    segmented = q_seg is not None
    cache_kv = cache_kv and q8.dtype != jnp.int8  # int8 has no decode chain

    kernel = functools.partial(
        _fp8_fwd_kernel,
        softmax_scale=softmax_scale, causal=causal,
        n_q=n_q, n_k=n_k, block_q=block_q, block_k=block_k, groups=groups,
        dropout_rate=dropout_rate, window=window, sinks=sinks,
        int8_payload=q8.dtype == jnp.int8,
        segmented=segmented, softcap=softcap, alibi=slopes is not None,
        cache_kv=cache_kv,
    )
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, h_, iq, ik, *_refs: (b_, h_, iq, 0)
    )
    # ``stages`` (the FA3 pipelining-depth knob the reference plumbs but
    # never uses — quirk Q6) sets the K/V stream's buffer count. Mosaic
    # supports 1 (halved VMEM, no overlap) or 2 (double buffering, the
    # default); deeper values clamp to 2.
    kv_pipeline = (
        pl.Buffered(buffer_count=1)
        if (stages == 1 and not interpret) else None
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, d),
        lambda b_, h_, iq, ik, *_refs: (b_, h_ // groups, ik, 0),
        pipeline_mode=kv_pipeline,
    )
    # Scalar-prefetch args (whole, in SMEM): sq, sk, sv, dropout seed,
    # plus ALiBi slopes when present. Segment-id blocks ride as regular
    # inputs ahead of q (same layouts as the bf16 kernel, _seg_layouts).
    prefetch = [sq, sk, sv, seed]
    if slopes is not None:
        prefetch.append(slopes)
    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q8, k8, v8]
    if segmented:
        in_specs[0:0] = [
            pl.BlockSpec((1, block_q, LANES),
                         lambda b_, h_, iq, ik, *_refs: (b_, iq, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda b_, h_, iq, ik, *_refs: (b_, 0, ik)),
        ]
        args[0:0] = [q_seg, kv_seg]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, iq, ik, *_refs: (b_, h_, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda b_, h_, iq, ik, *_refs: (b_, h_, iq, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ] + ([
            # Decode-once cache: q per row + whole decoded K/V rows (bf16).
            # Sized by the caller's VMEM gate (_cached_fused_fits).
            pltpu.VMEM((block_q, d), jnp.bfloat16),
            pltpu.VMEM((n_k_pad, d), jnp.bfloat16),
            pltpu.VMEM((n_k_pad, d), jnp.bfloat16),
        ] if cache_kv else []),
    )
    o, lse = _softcap_launch(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_q_pad, d), out_dtype),
            jax.ShapeDtypeStruct((b, h, n_q_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # The decode-once cache carries state ACROSS iq steps (tile
            # decoded at its first visiting q row, read by later rows), so
            # iq stops being a parallel dimension under cache_kv.
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary", "arbitrary")
                if cache_kv else
                ("parallel", "parallel", "parallel", "arbitrary")
            ),
        ),
        interpret=interpret,
    ), interpret, *prefetch, *args)
    return o, lse


def _dequant(payload, scales, block):
    b, h, n, d = payload.shape
    xb = payload.astype(jnp.float32).reshape(b, h, n // block, block, d)
    return (xb * scales[..., None, None]).reshape(b, h, n, d)


def _fp8_to_f32_xla(payload):
    """float8_e4m3fn -> float32 by integer bit surgery, XLA edition.

    The in-kernel decode (pallas_paged._fp8_e4m3_to_bf16_bits) exists
    because v5e's native fp8 cast lowers through a slow path; the same
    hazard applies to an XLA pre-pass, so the predecode mode uses the same
    re-biasing math with lax.bitcast_convert_type instead of pltpu.bitcast.
    Exact for all e4m3fn values incl. denormals; NaN (0x7f) maps to a large
    finite value (matches the kernel decode).
    """
    bits = jax.lax.bitcast_convert_type(payload, jnp.uint8).astype(jnp.int32)
    mag = bits & 0x7F
    sign = (bits & 0x80) << 24
    if payload.dtype == jnp.float8_e5m2:
        # e5m2: 1.mm x 2^(e-15) -> f32 exp e+112, mantissa m << 21;
        # denormals (e == 0) are m x 2^-16 exactly.
        out = sign | ((mag << 21) + (112 << 23))
        out = jnp.where(mag == 0, sign, out)
        f = jax.lax.bitcast_convert_type(out, jnp.float32)
        denorm = mag < 4
        unit = 2.0 ** -16
    else:
        out = sign | ((mag << 20) + (120 << 23))
        out = jnp.where(mag == 0, sign, out)
        f = jax.lax.bitcast_convert_type(out, jnp.float32)
        denorm = mag < 8
        unit = 2.0 ** -9
    return jnp.where(
        denorm,
        mag.astype(jnp.float32) * jnp.where(sign != 0, -unit, unit),
        f,
    )


def _dequant_bf16(payload, scales, block):
    """Dequantize to bf16 in one fused XLA pass (decode * scale -> bf16).
    int8 payloads convert with a plain astype (exact, no surgery needed)."""
    b, h, n, d = payload.shape
    xf = (
        payload.astype(jnp.float32) if payload.dtype == jnp.int8
        else _fp8_to_f32_xla(payload)
    )
    xb = xf.reshape(b, h, n // block, block, d)
    return (
        (xb * scales[..., None, None]).astype(jnp.bfloat16)
    ).reshape(b, h, n, d)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19),
)
def _fp8_attention(q, k, v, seed, q_ids, kv_ids, slopes, causal,
                   softmax_scale, block_q, block_k, interpret, out_dtype,
                   stages, dropout_rate, mode, softcap, window, sinks, fmt):
    return _fp8_attention_fwd_rule(
        q, k, v, seed, q_ids, kv_ids, slopes, causal, softmax_scale,
        block_q, block_k, interpret, out_dtype, stages, dropout_rate, mode,
        softcap, window, sinks, fmt,
    )[0]


def _fp8_blocks(n_q, n_k, block_q, block_k):
    """Effective (bq, bk) after clamping to the (padded) sequence lengths —
    shared by _prepare_fp8 and the mode="auto" VMEM gate so the gate always
    estimates the blocks the kernel will actually use."""
    bq = min(block_q, max(128, ((n_q + 31) // 32) * 32))
    bk = min(block_k, max(128, ((n_k + 127) // 128) * 128))
    bq = max(32, (bq // 32) * 32)
    bk = max(128, (bk // 128) * 128)
    return bq, bk


def _cached_fused_fits(n_q, n_k, d, block_q, block_k, out_bytes=2):
    """TOTAL-VMEM gate for mode="fused_cached" (the resident-dQ lesson,
    pallas_attn vmem_est: budget scratches + double-buffered pipeline
    blocks, never one buffer alone). True when the decode-once scratch
    plus the kernel's standing allocation fits 12 MB of the 16 MB scoped
    budget — the same 4 MB headroom the backward gate reserves for
    Mosaic's kernel-STACK temporaries (live (block_q, block_k) fp32
    score/p planes, measured 2.68 MB at (512,1024) in queue17; a 14 MB
    estimate compiled to a 16.68 MB scoped allocation there). An explicit
    mode="fused_cached" bypasses this gate by design (A/B harnesses probe
    over-budget shapes deliberately; the failure is a loud compile error,
    not silent corruption)."""
    bq, bk = _fp8_blocks(n_q, n_k, block_q, block_k)
    d_pad = d if (d % LANES == 0 or d == 64) else -(-d // LANES) * LANES
    n_k_pad = -(-n_k // bk) * bk
    est = (
        # decode-once cache: q row + whole decoded K/V rows, bf16
        bq * d_pad * 2 + 2 * n_k_pad * d_pad * 2
        # m/l (fp32, LANES wide) + acc (fp32, d wide)
        + 2 * bq * LANES * 4 + bq * d_pad * 4
        # fp8 payload pipeline: q + k + v blocks, double-buffered
        + 2 * (bq * d_pad + 2 * bk * d_pad)
        # out + lse blocks, double-buffered
        + 2 * (bq * d_pad * out_bytes + bq * 4)
    )
    return est <= 12 * 1024 * 1024


def _prepare_fp8(q, k, v, block_q, block_k, fmt="fp8"):
    n_q, n_k = q.shape[2], k.shape[2]
    d = q.shape[3]
    bq, bk = _fp8_blocks(n_q, n_k, block_q, block_k)
    q = _pad_dim(q, 2, bq)
    k = _pad_dim(k, 2, bk)
    v = _pad_dim(v, 2, bk)
    if d % LANES and d != 64:
        q = _pad_dim(q, 3, LANES)
        k = _pad_dim(k, 3, LANES)
        v = _pad_dim(v, 3, LANES)
    q8, sq = quantize_tiles(q, bq, fmt)
    k8, sk = quantize_tiles(k, bk, fmt)
    v8, sv = quantize_tiles(v, bk, fmt)
    return q8, k8, v8, sq, sk, sv, bq, bk, n_q, n_k, d


def _fp8_attention_fwd_rule(q, k, v, seed, q_ids, kv_ids, slopes, causal,
                            softmax_scale, block_q, block_k, interpret,
                            out_dtype, stages, dropout_rate, mode, softcap,
                            window, sinks, fmt="fp8"):
    q8, k8, v8, sq, sk, sv, bq, bk, n_q, n_k, d = _prepare_fp8(
        q, k, v, block_q, block_k, fmt
    )
    q_seg = kv_seg = None
    if q_ids is not None:
        q_seg, kv_seg = _seg_layouts(q_ids, kv_ids, bq, bk)
    if mode == "predecode":
        # Compute-bound shapes (several q tiles): the fused kernel would
        # bit-decode every K/V tile once PER Q TILE — O(N_q/bq) redundant
        # VPU work that costs ~20% of the kernel at N=8K (RESULTS.md). Here
        # the payloads are dequantized ONCE in an O(N*D) XLA pass and the
        # plain bf16 kernel runs at full speed. Numerics stay fp8-faithful:
        # the MXU sees exactly quantize->dequantize(bf16) values, the same
        # tensors the STE backward reconstructs.
        qd = _dequant_bf16(q8, sq, bq)
        kd = _dequant_bf16(k8, sk, bk)
        vd = _dequant_bf16(v8, sv, bk)
        qoff = jnp.asarray([n_k - n_q], jnp.int32)
        o, lse = _flash_fwd(
            qd, kd, vd, seed, qoff, causal=causal,
            softmax_scale=softmax_scale, block_q=bq, block_k=bk,
            interpret=interpret, n_q=n_q, n_k=n_k,
            dropout_rate=dropout_rate, stages=stages,
            q_seg=q_seg, kv_seg=kv_seg, softcap=softcap, slopes=slopes,
            window=window, sinks=sinks,
        )
        o = o.astype(out_dtype)
    else:
        o, lse = _fp8_fwd(
            q8, k8, v8, sq, sk, sv, causal=causal,
            softmax_scale=softmax_scale,
            block_q=bq, block_k=bk, out_dtype=out_dtype, interpret=interpret,
            n_q=n_q, n_k=n_k, stages=stages, seed=seed,
            dropout_rate=dropout_rate, window=window, sinks=sinks,
            q_seg=q_seg, kv_seg=kv_seg, softcap=softcap, slopes=slopes,
            cache_kv=mode == "fused_cached",
        )
    o_out = o[:, :, :n_q, :d]
    lse_out = lse[:, :, :n_q, 0]
    # 0-size dtype carriers: the backward must return dk/dv in k/v's dtype
    # (custom_vjp rejects mismatched cotangent avals under mixed precision).
    kd_tag = jnp.zeros((0,), k.dtype)
    vd_tag = jnp.zeros((0,), v.dtype)
    # STE flavor (FAT_STE_GRADS, trace time): "dequant" (default) saves
    # the payloads and the backward runs on DEQUANTIZED values — the
    # reference's fa3_bwd.cu:134-146 choice (the backward linearizes the
    # quantized forward). "original" is the classic straight-through
    # estimator (Bengio et al. 2013: treat quantize as identity in the
    # backward) — the backward runs on the ORIGINAL inputs, which are
    # free residuals: no dequant pass exists anywhere in the grad path
    # (the 8-bit fwd+bwd's only structural overhead vs bf16 otherwise —
    # one 144 MB HBM-bound pass at the N=8K headline shape).
    if _ste_original():
        return (o_out, lse_out), (
            q, k, v, None, None, None, seed, q_ids, kv_ids, slopes, o_out,
            lse_out, bq, bk, n_k, kd_tag, vd_tag,
        )
    return (o_out, lse_out), (
        q8, k8, v8, sq, sk, sv, seed, q_ids, kv_ids, slopes, o_out,
        lse_out, bq, bk, n_k, kd_tag, vd_tag,
    )


def _fp8_attention_bwd_rule(causal, softmax_scale, block_q, block_k,
                            interpret, out_dtype, stages, dropout_rate,
                            mode, softcap, window, sinks, fmt, residuals,
                            cotangents):
    """STE backward: run the bf16 backward kernels on the dequantized
    payloads (reference fa3_bwd.cu:134-146 semantics). With dropout, the
    same counter-based mask regenerates from (seed, bh, tile) — the bf16
    backward kernels share `_keep_mask` with the fp8 forward."""
    (q8, k8, v8, sq, sk, sv, seed, q_ids, kv_ids, slopes, o, lse, bq, bk,
     n_k, kd_tag, vd_tag) = residuals
    do, dlse = cotangents
    if _ste_original():
        # Classic STE (see fwd rule): residuals hold the ORIGINAL inputs;
        # pad to the backward tiling like _prepare_fp8 does for payloads.
        qd = _pad_dim(q8.astype(jnp.bfloat16), 2, bq)
        kd = _pad_dim(k8.astype(jnp.bfloat16), 2, bk)
        vd = _pad_dim(v8.astype(jnp.bfloat16), 2, bk)
        if qd.shape[-1] % LANES and qd.shape[-1] != 64:
            qd = _pad_dim(qd, 3, LANES)
            kd = _pad_dim(kd, 3, LANES)
            vd = _pad_dim(vd, 3, LANES)
    else:
        # _dequant_bf16 = bit-surgery decode (exact for every e4m3fn/e5m2
        # value): identical values to the native-cast path but avoids
        # v5e's slow fp8 .astype, and is the SAME expression the
        # predecode forward emits — XLA CSEs the two passes when fwd+bwd
        # trace into one jit.
        qd = _dequant_bf16(q8, sq, bq)
        kd = _dequant_bf16(k8, sk, bk)
        vd = _dequant_bf16(v8, sv, bk)
    n_q, d = o.shape[2], o.shape[3]
    op = _pad_dim(o.astype(jnp.bfloat16), 2, bq)
    dop = _pad_dim(do.astype(jnp.bfloat16), 2, bq)
    if op.shape[-1] != qd.shape[-1]:
        op = _pad_dim(op, 3, LANES)
        dop = _pad_dim(dop, 3, LANES)
    lsep = _pad_dim(lse, 2, bq, value=1e9)[..., None]
    dlsep = _pad_dim(dlse, 2, bq)[..., None]
    q_seg = kv_seg = None
    if q_ids is not None:
        q_seg, kv_seg = _seg_layouts(q_ids, kv_ids, bq, bk)
    dq, dk, dv = _flash_bwd(
        qd, kd, vd, op, lsep, dop, seed,
        causal=causal, softmax_scale=softmax_scale, block_q=bq, block_k=bk,
        interpret=interpret, n_q=n_q, n_k=n_k, dropout_rate=dropout_rate,
        dlse=dlsep, q_seg=q_seg, kv_seg=kv_seg, softcap=softcap,
        slopes=slopes, window=window, sinks=sinks,
    )
    return (
        dq[:, :, :n_q, :d].astype(out_dtype),
        dk[:, :, :n_k, :d].astype(kd_tag.dtype),
        dv[:, :, :n_k, :d].astype(vd_tag.dtype),
        None,
        None,
        None,
        None,
    )


_fp8_attention.defvjp(_fp8_attention_fwd_rule, _fp8_attention_bwd_rule)


def pallas_fp8_attention_prequant(
    q8: jax.Array, k8: jax.Array, v8: jax.Array,
    sq: jax.Array, sk: jax.Array, sv: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused FP8 attention on already-quantized tiles (the serving path:
    K/V live in the cache as fp8 payloads + per-tile scales; no quantization
    pre-pass in the hot loop). Tile sizes are implied by the scale shapes:
    block_q = N_q / sq.shape[-1], block_k = N_k / sk.shape[-1]."""
    b, h, n_q, d = q8.shape
    n_k = k8.shape[2]
    block_q = n_q // sq.shape[-1]
    block_k = n_k // sk.shape[-1]
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if interpret is None:
        interpret = _interpret_default()
    o, lse = _fp8_fwd(
        q8, k8, v8, sq, sk, sv, causal=causal,
        softmax_scale=float(softmax_scale), block_q=block_q, block_k=block_k,
        out_dtype=out_dtype, interpret=interpret, n_q=n_q, n_k=n_k,
    )
    return o, lse[..., 0]


def pallas_fp8_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    stages: int = 2,
    interpret: bool | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int | None = None,
    mode: str = "auto",
    softcap: float | None = None,
    segment_ids=None,
    alibi_slopes: jax.Array | None = None,
    window: int | None = None,
    sinks: int = 0,
    fmt: str = "fp8",
) -> tuple[jax.Array, jax.Array]:
    """FA3 fused-FP8 flash attention: quantizes q/k/v to float8_e4m3fn with
    per-tile scales, streams 1-byte payloads through the kernel, descales in
    the score/output scaling. ``stages`` = K/V pipeline buffer depth.

    ``fmt="int8"`` swaps the payload format for int8 — the TPU-native
    choice: v5e's MXU is int8-native (s8xs8->s32 at 2x bf16 peak), so the
    fused kernel runs raw s8 matmuls with NO per-element convert chain
    (e4m3's 8-14-op bit surgery is the measured bottleneck of the fp8
    bandwidth story, RESULTS.md round 3). Scores are exact int32 products
    descaled by the same per-tile scalars; softmax weights p re-quantize
    per row (~0.4%/element noise, the class the payloads already carry).
    The STE backward is identical (bf16 kernels on dequantized payloads).
    Extension beyond the reference, whose fp8 targets H100 tensor cores
    (src/fa3/torch/impl.py:118-133).

    ``mode`` picks the execution strategy for the quantized math:
      - "fused": in-kernel bit decode of the fp8 payloads, once per
        (q tile, kv tile) — halves the K/V HBM stream; the win at
        bandwidth-bound shapes (decode, long KV, single q tile).
      - "fused_cached" (round 5): fused with a decode-ONCE VMEM cache —
        each K/V tile is decoded on first visit into a whole-row bf16
        scratch and reused by every later q tile, so the 1-byte HBM
        stream is kept while the decode tax drops to O(N_k) total. The
        win at compute-bound multi-q-tile shapes; needs the decoded rows
        to fit the VMEM budget (_cached_fused_fits).
      - "predecode": one O(N*D) XLA dequant pass, then the bf16 kernel —
        full bf16 HBM traffic, zero in-kernel decode; the fallback when
        the cached scratch doesn't fit.
      - "auto" (default): "fused" for int8 or single-q-tile shapes,
        else "fused_cached" when it fits (FAT_FP8_CACHED=0 disables),
        else "predecode".
    Both modes feed the MXU the same quantize->dequantize values; outputs
    agree to bf16 rounding class.

    GQA: k/v may carry H_kv < H heads (H % H_kv == 0) — KV payload tiles and
    their descales are shared across each query-head group, same index maps
    as the bf16 kernel (pallas_attn._flash_fwd). Dropout uses the bf16
    kernels' counter-based mask (identical replay in the STE backward).

    ``window``/``sinks``: sliding-window attention (+ StreamingLLM sinks),
    fused-kernel native since round 3 — the fp8 kernel shares the bf16
    kernels' band tile dispatch (tiles wholly outside the band/sinks skip
    their compute: O(N*(W+S)) tile work, on top of fp8's halved per-tile
    HBM traffic). Requires causal=True; the STE backward runs the bf16
    backward kernels with the same band.

    ``softcap``/``segment_ids``/``alibi_slopes``: fused-kernel native since
    round 4 — same tanh cap, packed-varlen segment masks, and in-kernel
    ALiBi bias as the bf16 kernel (shared helpers), applied to the descaled
    scores. Previously these forced mode="predecode", which paid full bf16
    HBM traffic at exactly the bandwidth-bound shapes fused mode exists for.
    Returns (o in q.dtype, lse fp32)."""
    if q.ndim != 4:
        raise ValueError(f"expected (B, H, N, D), got {q.shape}")
    h_q, h_kv = q.shape[1], k.shape[1]
    if h_q % h_kv != 0:
        raise ValueError(f"H={h_q} must be a multiple of H_kv={h_kv}")
    d = q.shape[-1]
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    if interpret is None:
        interpret = _interpret_default()
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = jnp.asarray(
        [0 if dropout_seed is None else dropout_seed], jnp.int32
    ).ravel()[:1]
    if mode not in ("auto", "fused", "fused_cached", "predecode"):
        raise ValueError(
            f"mode must be auto|fused|fused_cached|predecode, got {mode!r}"
        )
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
    if fmt not in ("fp8", "int8", "e5m2"):
        raise ValueError(f"fmt must be fp8|int8|e5m2, got {fmt!r}")
    if mode == "auto":
        # int8 payloads have NO decode chain — the raw s8 tiles feed the
        # MXU directly — so plain fused is optimal at every shape; ditto
        # single-q-tile fp8 (each K/V tile is decoded exactly once anyway).
        # Multi-q-tile fp8/e5m2 default to "predecode" (one O(N*D) XLA
        # dequant pass + the full-speed bf16 kernel): the round-5
        # "fused_cached" kernel (decode each tile ONCE into a whole-row
        # VMEM scratch) removes the per-q-tile re-decode tax but measures
        # PARITY with predecode on wall clock (queue17 A/Bs: fwd median
        # 1.006, bwd 0.96 — the one-time decode's VPU cost ~= the dequant
        # pass's HBM cost on this chip), while predecode additionally
        # lets XLA CSE the STE backward's dequant with the forward's
        # (fused_cached as auto default cost fp8_fwdbwd ~6 TF, queue17
        # bench). FAT_FP8_CACHED=1 opts auto into fused_cached where its
        # actual win matters: no materialized bf16 q/k/v copies (96 MB at
        # the headline shape) on inference-only paths.
        # softcap/segment_ids/alibi are fused-native since round 4
        # (VERDICT r3 item 7) and no longer force predecode.
        import os

        if fmt == "int8" or q.shape[2] <= block_q:
            mode = "fused"
        elif (
            os.environ.get("FAT_FP8_CACHED", "0") == "1"
            and _cached_fused_fits(q.shape[2], k.shape[2], d,
                                   block_q, block_k,
                                   out_bytes=q.dtype.itemsize)
        ):
            mode = "fused_cached"
        else:
            mode = "predecode"
    q_ids = kv_ids = None
    if segment_ids is not None:
        if isinstance(segment_ids, (tuple, list)):
            q_ids, kv_ids = segment_ids
        else:
            q_ids = kv_ids = segment_ids
        q_ids = jnp.asarray(q_ids, jnp.int32)
        kv_ids = jnp.asarray(kv_ids, jnp.int32)
    slopes = None
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).ravel()
        if slopes.shape != (q.shape[1],):
            raise ValueError(
                f"alibi_slopes must be (H,)=({q.shape[1]},), "
                f"got {slopes.shape}"
            )
    return _fp8_attention(
        q, k, v, seed, q_ids, kv_ids, slopes, causal, float(softmax_scale),
        int(block_q), int(block_k), bool(interpret), q.dtype, int(stages),
        float(dropout_rate), mode,
        float(softcap) if softcap is not None else None,
        int(window) if window is not None else None, int(sinks), fmt,
    )
