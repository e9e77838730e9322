"""Pallas paged-attention decode kernel.

Decode is HBM-bandwidth-bound: one query token attends to the whole KV
cache, so the kernel's job is to stream K/V pages from HBM at line rate and
hide the transfer behind the (tiny) per-page compute. Design:

- grid = (batch, kv_head, page_slot). The physical page for grid step j is
  resolved *inside the BlockSpec index maps* from the scalar-prefetched page
  table (``PrefetchScalarGridSpec``): ``k_block = k_pages[h, page_indices[b,
  j]]``. Pallas's pipeline machinery double-buffers these blocks
  automatically — the fetch for step j+1 is in flight while step j computes.
- Page-table rows padded with a repeated page (the engine's dump page) cost
  ~nothing: the index map returns the same block index, Pallas skips the
  re-fetch of an unchanged block, and compute for slots past the sequence's
  page count is predicated off.
- Quantized caches (int8 / float8_e4m3fn payloads with per-(page, slot) fp32
  scales — layout in serving/paged_kv.py) are dequantized right after
  landing in VMEM: payload · scale broadcasts per-sublane, one VPU pass. The
  bandwidth win is the 1-byte payload on the wire; compute runs fp32.
- GQA: the grid is over KV heads; all H/H_kv query heads of the group attend
  to the same streamed pages (q block (1, 1, G, D), G padded to >= 8
  sublanes).

The XLA gather executor (serving/paged_kv.py:paged_attention_decode) is the
always-runs-anywhere correctness anchor; this kernel is the TPU fast path.
The reference repo has no serving layer at all — this is new scope from
BASELINE.json (FP8 paged KV decode); the closest reference analogue is the
KV-cache-shaped causal mask (src/fa3/torch/flashattention_pytorch.py:176-190).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(
    # scalar prefetch
    page_indices_ref,  # (B * pages_per_seq,) int32 in SMEM
    lengths_ref,       # (B,) int32 in SMEM
    # pipelined inputs
    q_ref,             # (1, 1, G, D) VMEM
    k_ref,             # (1, 1, page, D) current page payload
    v_ref,
    *rest,             # [ks_ref (1,1,page,1), vs_ref,] o_ref, m/l/acc scratch
    softmax_scale,
    pages_per_seq,
    page_size,
    quantized,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
        ks_ref = vs_ref = None

    b = pl.program_id(0)
    j = pl.program_id(2)
    n_slots = pl.num_programs(2)

    length = lengths_ref[b]
    n_pages = jnp.minimum((length + page_size - 1) // page_size, pages_per_seq)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(j < n_pages)
    def _update():
        q = q_ref[0, 0].astype(jnp.float32) * jnp.float32(softmax_scale)
        kf = k_ref[0, 0].astype(jnp.float32)  # (page, D)
        vf = v_ref[0, 0].astype(jnp.float32)
        if quantized:
            kf = kf * ks_ref[0, 0]            # (page, 1) per-slot scales
            vf = vf * vs_ref[0, 0]

        # HIGHEST: decode is bandwidth-bound, so fp32 bf16x6 matmuls are
        # free accuracy (the default bf16x3 shows ~6e-3 vs the exact oracle).
        s = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, page)
        slots = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        s = jnp.where(slots < length, s, -jnp.inf)

        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p, vf, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(j == n_slots - 1)
    def _store():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


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
    interpret: bool | None = None,
) -> jax.Array:
    """Paged decode attention on TPU. Returns (B, H, D) in q.dtype.

    GQA: H % H_kv == 0; query heads are grouped per KV head. Quantized caches
    pass per-slot fp32 scales (both or neither of k_scales/v_scales).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h_q, d = q.shape
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

    # Pad the group dim to the fp32 sublane minimum (8).
    g_pad = max(groups, 8)
    q4 = q.reshape(b, h_kv, groups, d)
    if g_pad != groups:
        q4 = jnp.pad(q4, [(0, 0), (0, 0), (0, g_pad - groups), (0, 0)])

    kernel = functools.partial(
        _decode_kernel,
        softmax_scale=float(softmax_scale),
        pages_per_seq=pages_per_seq,
        page_size=page_size,
        quantized=quantized,
    )

    def idx_q(b_, h_, j, pi, ln):
        return (b_, h_, 0, 0)

    def idx_page(b_, h_, j, pi, ln):
        return (h_, pi[b_ * pages_per_seq + j], 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, g_pad, d), idx_q),
        pl.BlockSpec((1, 1, page_size, d), idx_page),
        pl.BlockSpec((1, 1, page_size, d), idx_page),
    ]
    args = [q4, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, page_size, 1), idx_page),
            pl.BlockSpec((1, 1, page_size, 1), idx_page),
        ]
        args += [k_scales, v_scales]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h_kv, pages_per_seq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g_pad, d), idx_q),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, d), jnp.float32),
        ],
    )

    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_kv, g_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_indices.reshape(-1), lengths, *args)
    return o[:, :, :groups, :].reshape(b, h_q, d)
