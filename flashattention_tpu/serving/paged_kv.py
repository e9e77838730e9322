"""Paged KV cache with optional int8/fp8 page quantization.

Page-table layout (the jax/pallas paged-attention convention; see
/opt/skills/guides/boom_attention_tricks.md §8):

    k_pages, v_pages: (num_kv_heads, num_pages, page_size, head_dim)
    page_indices:     (batch, pages_per_seq)  — logical -> physical
    lengths:          (batch,)                — tokens written per sequence

Quantized caches store an int8 or float8_e4m3fn payload plus per
(head, page, slot) fp32 scales — per-token scales quantize correctly under
incremental appends (a page-wide absmax would re-scale already-written
slots). Loading 1-byte payloads halves decode HBM bandwidth, which is the
decode bottleneck.

The decode attention here is the XLA gather-based executor (correctness
anchor + works everywhere); the Pallas double-buffered paged kernel rides on
top in ops/pallas_paged.py.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
FP8_MAX = 448.0      # float8_e4m3fn max normal
E5M2_MAX = 57344.0   # float8_e5m2 max normal (wider range, 2 mantissa bits)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """One layer's paged cache. ``quant`` in {None, "int8", "fp8"}."""

    k_pages: jax.Array            # (H_kv, P, page, D) payload
    v_pages: jax.Array
    k_scales: jax.Array | None    # (H_kv, P, page, 1) fp32 or None
    v_scales: jax.Array | None
    quant: str | None = dataclasses.field(metadata=dict(static=True), default=None)

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]


def init_paged_cache(
    num_kv_heads: int,
    num_pages: int,
    page_size: int,
    head_dim: int,
    *,
    quant: str | None = None,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    if quant == "int8":
        payload_dtype = jnp.int8
    elif quant == "fp8":
        payload_dtype = jnp.float8_e4m3fn
    elif quant == "e5m2":
        # Range-heavy fp8 variant (SURVEY §2.2 N4 names e4m3/e5m2); the
        # decode chain is a shift-only magic (pallas_paged, cheaper than
        # e4m3's) at 2 mantissa bits of precision.
        payload_dtype = jnp.float8_e5m2
    elif quant is None:
        payload_dtype = dtype
    else:
        raise ValueError(
            f"quant must be None|'int8'|'fp8'|'e5m2', got {quant!r}"
        )
    shape = (num_kv_heads, num_pages, page_size, head_dim)
    scale_shape = (num_kv_heads, num_pages, page_size, 1)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, payload_dtype),
        v_pages=jnp.zeros(shape, payload_dtype),
        k_scales=jnp.ones(scale_shape, jnp.float32) if quant else None,
        v_scales=jnp.ones(scale_shape, jnp.float32) if quant else None,
        quant=quant,
    )


def _quantize_tokens(x: jax.Array, quant: str, payload_dtype):
    """x fp32 (..., D) -> (payload (..., D), scale (...,)) absmax scales."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    qmax = {"int8": INT8_MAX, "fp8": FP8_MAX, "e5m2": E5M2_MAX}[quant]
    scale = jnp.maximum(absmax / qmax, 1e-6)
    y = x / scale[..., None]
    if quant == "int8":
        return jnp.round(y).astype(jnp.int8), scale
    return y.astype(payload_dtype), scale


@partial(jax.jit, donate_argnums=(0,))
def append_to_pages(
    cache: PagedKVCache,
    k_new: jax.Array,   # (B, H_kv, T, D) new tokens (T=1 decode, T=n prefill)
    v_new: jax.Array,
    page_indices: jax.Array,  # (B, pages_per_seq)
    lengths: jax.Array,       # (B,) current lengths BEFORE this append
    valid_len: jax.Array | None = None,  # (B,) tokens of the T that are real
) -> PagedKVCache:
    """Scatter new K/V tokens into their pages — one vectorized scatter over
    all (b, t) targets (an unrolled per-token loop traces O(B·T) sequential
    ops and blows compile time on the prefill path).

    Masked-out writes (``valid_len`` padding, or positions past the
    sequence's page capacity — which would otherwise silently overwrite live
    KV in the clamped last page) are *dropped*: their page index is redirected
    out of bounds and the scatter runs with ``mode="drop"``. (Writing the
    target's existing value back is NOT a safe no-op: a masked position can
    alias a genuine in-range write at the same (phys, slot), and XLA scatter
    order for duplicate indices is unspecified, so the stale write-back could
    clobber live KV.)
    """
    b, h, t, d = k_new.shape
    page = cache.page_size
    pps = page_indices.shape[1]

    if t == 1 and os.environ.get("FAT_APPEND_DUS", "0") == "1":
        return _append_decode_dus(
            cache, k_new, v_new, page_indices, lengths, valid_len
        )
    # DEFAULT ON since round 4: queue10 same-window A/B measured the full
    # serving step at 3.853 ms with the Pallas in-place append vs 4.305 ms
    # with the scatter path (parity delta exactly 0.0). The scatter path
    # remains for prefill (T>1) and FAT_APPEND_PALLAS=0. Quantized caches
    # route their 1-byte payloads through the same kernel; only the small
    # fp32 scale planes (H·P·page·4 B ≈ 4 MB at serving shapes — not the
    # hundreds-of-MB payload the defensive-copy problem is about) keep the
    # XLA scatter.
    # d % 128: Mosaic can't legalize the kernel's (H,1,1,D) broadcast when
    # the head dim is narrower than one 128-lane register (observed compile
    # failure "unsupported shape cast" at d=16) — sub-lane head dims take
    # the scatter path.
    if (t == 1 and d % 128 == 0
            and os.environ.get("FAT_APPEND_PALLAS", "1") == "1"):
        return _append_decode_pallas(
            cache, k_new, v_new, page_indices, lengths, valid_len
        )

    pos = lengths[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # (B, T)
    ok = pos < pps * page
    if valid_len is not None:
        ok = ok & (jnp.arange(t, dtype=jnp.int32)[None, :] < valid_len[:, None])
    logical = jnp.minimum(pos // page, pps - 1)
    slot = pos % page
    phys = jnp.take_along_axis(page_indices, logical, axis=1)  # (B, T)

    # Out-of-bounds page index for masked positions -> scatter drops them.
    phys = jnp.where(ok, phys, cache.num_pages)

    phys_f = phys.reshape(-1)
    slot_f = slot.reshape(-1)

    def write(pages, scales, new):
        tok = new.transpose(0, 2, 1, 3).reshape(b * t, h, d).astype(jnp.float32)
        if cache.quant:
            payload, scale = _quantize_tokens(tok, cache.quant, pages.dtype)
        else:
            payload, scale = tok.astype(pages.dtype), None
        payload = payload.transpose(1, 0, 2)                   # (H, B·T, D)
        pages = pages.at[:, phys_f, slot_f, :].set(payload, mode="drop")
        if scale is not None:
            scale = scale.transpose(1, 0)                      # (H, B·T)
            scales = scales.at[:, phys_f, slot_f, 0].set(scale, mode="drop")
        return pages, scales

    k_pages, k_scales = write(cache.k_pages, cache.k_scales, k_new)
    v_pages, v_scales = write(cache.v_pages, cache.v_scales, v_new)
    return dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages,
        k_scales=k_scales, v_scales=v_scales,
    )


def _append_decode_pallas(cache, k_new, v_new, page_indices, lengths,
                          valid_len):
    """T=1 decode append via the in-place Pallas kernel
    (FAT_APPEND_PALLAS; ops/pallas_append.py has the full rationale:
    scatter + Pallas-consumer composition costs ~2.9 ms/step in XLA
    defensive copies — queue9/serving_attrib2.log).

    Quantized caches (round 4): the token is quantized here and its 1-byte
    payload rides the same in-place kernel; the per-slot fp32 scales — a
    (H, P, page, 1) plane ~100x smaller than the payload — are scattered
    with plain XLA (any defensive copy is of the small plane only, and the
    (page, 1) lane-1 layout is a Mosaic slicing hazard inside kernels)."""
    from flashattention_tpu.ops.pallas_append import pallas_append_decode
    from flashattention_tpu.ops.pallas_attn import _interpret_default

    page = cache.page_size
    pps = page_indices.shape[1]
    ok = lengths < pps * page
    if valid_len is not None:
        ok = ok & (valid_len > 0)
    logical = jnp.minimum(lengths // page, pps - 1)
    slot = lengths % page
    phys = jnp.take_along_axis(page_indices, logical[:, None], axis=1)[:, 0]

    kn = k_new[:, :, 0, :]   # (B, H_kv, D)
    vn = v_new[:, :, 0, :]
    k_scales, v_scales = cache.k_scales, cache.v_scales
    if cache.quant:
        kn, ks = _quantize_tokens(
            kn.astype(jnp.float32), cache.quant, cache.k_pages.dtype
        )
        vn, vs = _quantize_tokens(
            vn.astype(jnp.float32), cache.quant, cache.v_pages.dtype
        )
        # Masked rows: redirect the page index out of bounds -> drop.
        phys_w = jnp.where(ok, phys, cache.num_pages)
        k_scales = k_scales.at[:, phys_w, slot, 0].set(ks.T, mode="drop")
        v_scales = v_scales.at[:, phys_w, slot, 0].set(vs.T, mode="drop")
    kp, vp = pallas_append_decode(
        cache.k_pages, cache.v_pages, kn, vn,
        phys, slot, ok, interpret=_interpret_default(),
    )
    return dataclasses.replace(
        cache, k_pages=kp, v_pages=vp, k_scales=k_scales, v_scales=v_scales,
    )


def _append_decode_dus(cache, k_new, v_new, page_indices, lengths, valid_len):
    """T=1 decode append as B sequential dynamic_update_slices (FAT_APPEND_DUS).

    queue8's serving attribution localized a ~2.8 ms/step penalty to the
    scatter append feeding the Pallas paged kernel inside one jitted step
    (append alone ~0, attention alone ~1.1 ms, together 4.2 ms — a
    per-iteration cache copy); XLA provably updates in-loop
    dynamic_update_slice chains in place. O(B) sequential trace is fine at
    decode (B slices of (H,1,1,D)); the prefill path (T>1) keeps the
    vectorized scatter, whose one-shot write amortizes any copy.

    Masked writes (position past page capacity, or valid_len == 0) use
    read-modify-write: the target's CURRENT value writes back. Unlike the
    scatter path — where a stale write-back could clobber a concurrent
    in-range write at a duplicate (phys, slot) under XLA's unspecified
    scatter order — the fori_loop is SEQUENTIAL, so iteration i's
    read sees every earlier write and clobbering is impossible.
    """
    b, h, _, d = k_new.shape
    page = cache.page_size
    pps = page_indices.shape[1]
    ok = lengths < pps * page
    if valid_len is not None:
        ok = ok & (valid_len > 0)
    logical = jnp.minimum(lengths // page, pps - 1)
    slot = lengths % page
    phys = jnp.take_along_axis(page_indices, logical[:, None], axis=1)[:, 0]

    def prep(new, pages_dtype):
        tok = new[:, :, 0, :].astype(jnp.float32)  # (B, H, D)
        if cache.quant:
            return _quantize_tokens(tok, cache.quant, pages_dtype)
        return tok.astype(pages_dtype), None

    kp_new, ks_new = prep(k_new, cache.k_pages.dtype)
    vp_new, vs_new = prep(v_new, cache.v_pages.dtype)

    def body(i, bufs):
        kp, ks, vp, vs = bufs
        at = (0, phys[i], slot[i], 0)

        def upd(pages, payload):
            cur = jax.lax.dynamic_slice(pages, at, (h, 1, 1, d))
            val = jnp.where(
                ok[i], payload[i][:, None, None, :].astype(pages.dtype), cur
            )
            return jax.lax.dynamic_update_slice(pages, val, at)

        kp = upd(kp, kp_new)
        vp = upd(vp, vp_new)
        if ks is not None:

            def upds(scales, scale):
                cur = jax.lax.dynamic_slice(scales, at, (h, 1, 1, 1))
                val = jnp.where(ok[i], scale[i][:, None, None, None], cur)
                return jax.lax.dynamic_update_slice(scales, val, at)

            ks = upds(ks, ks_new)
            vs = upds(vs, vs_new)
        return kp, ks, vp, vs

    kp, ks, vp, vs = jax.lax.fori_loop(
        0, b, body,
        (cache.k_pages, cache.k_scales, cache.v_pages, cache.v_scales),
    )
    return dataclasses.replace(
        cache, k_pages=kp, v_pages=vp, k_scales=ks, v_scales=vs
    )


def gather_pages(cache: PagedKVCache, page_indices: jax.Array):
    """Materialize per-sequence contiguous K/V: (B, H, pages*page, D) fp32."""
    # (H, P, page, D)[:, idx] -> (H, B, pages, page, D)
    k = cache.k_pages[:, page_indices]
    v = cache.v_pages[:, page_indices]
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    if cache.quant:
        k = k * cache.k_scales[:, page_indices]
        v = v * cache.v_scales[:, page_indices]
    b = page_indices.shape[0]
    h = k.shape[0]
    k = k.transpose(1, 0, 2, 3, 4).reshape(b, h, -1, k.shape[-1])
    v = v.transpose(1, 0, 2, 3, 4).reshape(b, h, -1, v.shape[-1])
    return k, v


@partial(jax.jit, static_argnames=("softmax_scale", "window", "softcap", "sinks"))
def paged_attention_decode(
    q: jax.Array,             # (B, H, D) one query token per sequence
    cache: PagedKVCache,
    page_indices: jax.Array,  # (B, pages_per_seq)
    lengths: jax.Array,       # (B,) valid tokens per sequence
    *,
    softmax_scale: float | None = None,
    window: int | None = None,
    softcap: float | None = None,
    sinks: int = 0,
) -> jax.Array:
    """Decode attention against the paged cache (XLA executor).

    GQA: H query heads attend to H_kv cache heads with H % H_kv == 0.
    ``window`` restricts each query to its last ``window`` cache slots
    (slots in (length - window, length)). Returns (B, H, D) in q.dtype.
    """
    b, h_q, d = q.shape
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    k, v = gather_pages(cache, page_indices)  # (B, H_kv, L, D) fp32
    h_kv = k.shape[1]
    groups = h_q // h_kv
    qf = q.astype(jnp.float32).reshape(b, h_kv, groups, d)
    s = jnp.einsum("bhgd,bhld->bhgl", qf, k) * softmax_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)  # cap BEFORE the length mask
    slot = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    length_mask = slot < lengths[:, None, None, None]
    if window is not None:
        band = slot >= lengths[:, None, None, None] - window
        if sinks:
            band = band | (slot < sinks)  # StreamingLLM sinks
        length_mask = length_mask & band
    s = jnp.where(length_mask, s, -0.7 * jnp.finfo(jnp.float32).max)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgl,bhld->bhgd", p, v)
    return o.reshape(b, h_q, d).astype(q.dtype)
