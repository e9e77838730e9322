"""Block-sparse flash attention on TPU (splash-style grid compaction).

The reference's block-sparse path (``_block_sparse_flash_attention``,
src/fa3/torch/flashattention_pytorch.py:94-174, "Algorithm 5") skips masked
blocks *inside* a dense loop — every (i, j) pair is still visited and the
K/V tiles still stream. The TPU-native version compacts the iteration space
instead:

- For each Q tile, the list of its active KV tiles (and the count) is
  precomputed from the block pattern and delivered through **scalar
  prefetch** (SMEM), so the KV BlockSpec's *index map itself* reads the
  compacted list: ``k_block_index = kv_list[iq, j]``.
- Inactive tiles are never DMA'd and never computed: grid step j beyond the
  active count re-points at the previous tile (Pallas skips the re-fetch of
  an unchanged block) and the kernel body is predicated off.
- Causal masking folds into the pattern at tile granularity; diagonal
  (straddling) tiles get the exact elementwise mask from absolute indices.

Backward reuses the same compaction: a dKV kernel walks each KV tile's
active Q tiles (the transposed lists) and a dQ kernel walks each Q tile's
active KV tiles, both recomputing P from the saved LSE (LSE-recompute
backward — reference src/fa1/torch/impl.py:70-115).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattention_tpu.ops.pallas_attn import _tile_mask
from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE

LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _compact_rows(active: jax.Array):
    """(R, C) bool -> (order (R, C) int32: active col indices first, padded
    with the last active one; counts (R,) int32).

    Repeating the last active index for the padding slots means a grid step
    past the count re-addresses an already-resident block — no wasted DMA.
    """
    r, c = active.shape
    counts = jnp.sum(active, axis=1).astype(jnp.int32)
    # stable argsort of (not active) puts active column indices first,
    # preserving ascending order within each group.
    order = jnp.argsort(~active, axis=1, stable=True).astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    last_active = jnp.take_along_axis(
        order, jnp.maximum(counts - 1, 0)[:, None], axis=1
    )
    order = jnp.where(pos < counts[:, None], order, last_active)
    return order, counts


def _tile_pattern(
    pattern: jax.Array | None,
    n_q_tiles: int,
    n_k_tiles: int,
    block_q: int,
    block_k: int,
    causal: bool,
    offset: int,
):
    """Combine the user block pattern with tile-granular causal reachability."""
    if pattern is None:
        active = jnp.ones((n_q_tiles, n_k_tiles), bool)
    else:
        if pattern.shape != (n_q_tiles, n_k_tiles):
            raise ValueError(
                f"pattern must be (n_q_tiles, n_k_tiles)="
                f"({n_q_tiles}, {n_k_tiles}), got {pattern.shape}"
            )
        active = pattern.astype(bool)
    if causal:
        iq = jax.lax.broadcasted_iota(jnp.int32, (n_q_tiles, n_k_tiles), 0)
        ik = jax.lax.broadcasted_iota(jnp.int32, (n_q_tiles, n_k_tiles), 1)
        reachable = (iq * block_q + block_q - 1 + offset) >= ik * block_k
        active = active & reachable
    return active


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _sparse_fwd_kernel(
    kv_list_ref, kv_count_ref,  # scalar prefetch
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, softmax_scale, causal, n_q, n_k, block_q, block_k,
):
    iq = pl.program_id(2)
    j = pl.program_id(3)
    n_slots = pl.num_programs(3)
    offset = n_k - n_q
    ik = kv_list_ref[iq, j]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Lagged-max frame (ported from the bf16 kernel, round 4 — 11.6%
    # forward win, queue11/ab_lagged_inproc): grid slot 0 is ALWAYS an
    # active tile for a non-empty row (compacted list front-loads active
    # tiles), so "first visited" == (j == 0) here.
    from flashattention_tpu.ops.pallas_attn import _lagged_env as _le

    lagged_env = _le()

    def _update(lagged_tile=False):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * jnp.float32(softmax_scale)
        # Elementwise mask from absolute indices (shared with the dense
        # kernels): needed on the causal diagonal and at the ragged KV edge.
        mask = _tile_mask(iq, ik, block_q, block_k, n_q, n_k, causal, offset)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        v = v_ref[0, 0]
        if lagged_tile:
            # Frame fallback covers rows whose tile-0 scores were all
            # masked (m still at -inf/DEFAULT_MASK_VALUE class).
            frame = jnp.where(m_prev < -1e30, 0.0, m_prev)
            p = jnp.exp(jnp.minimum(s - frame[:, :1], 60.0))
            p = jnp.where(mask, p, 0.0)
            sum_p = jnp.sum(p, axis=1, keepdims=True)
            acc_mid = acc_scr[...] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            m_curr = jnp.max(s, axis=1, keepdims=True)   # off p's path
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(jnp.minimum(frame - m_next, 60.0))
            l_scr[...] = (l_scr[...] + sum_p) * alpha
            acc_scr[...] = acc_mid * alpha[:, :1]
            m_scr[...] = m_next
            return
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        # Exact zeroing: a row whose active tiles are all masked would
        # otherwise contribute p == 1 garbage (see pallas_attn fwd note).
        p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    run = j < kv_count_ref[iq]
    if lagged_env:
        @pl.when(run & (j == 0))
        def _first():
            _update(lagged_tile=False)

        @pl.when(run & (j != 0))
        def _rest():
            _update(lagged_tile=True)
    else:
        @pl.when(run)
        def _upd():
            _update()

    @pl.when(j == n_slots - 1)
    def _store():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log(l_safe)


def _sparse_fwd(
    q, k, v, kv_list, kv_count, *, causal, softmax_scale, block_q, block_k,
    interpret, n_q, n_k,
):
    b, h, n_q_pad, d = q.shape
    groups = h // k.shape[1]  # GQA: query head h_ reads KV head h_ // groups
    n_k_pad = k.shape[2]
    n_q_tiles = n_q_pad // block_q
    n_slots = kv_list.shape[1]

    kernel = functools.partial(
        _sparse_fwd_kernel,
        softmax_scale=softmax_scale, causal=causal, n_q=n_q, n_k=n_k,
        block_q=block_q, block_k=block_k,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h, n_q_tiles, n_slots),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda b_, h_, iq, j, kv_list, kv_count: (b_, h_, iq, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b_, h_, iq, j, kv_list, kv_count: (
                    b_, h_ // groups, kv_list[iq, j], 0
                ),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda b_, h_, iq, j, kv_list, kv_count: (
                    b_, h_ // groups, kv_list[iq, j], 0
                ),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda b_, h_, iq, j, kv_list, kv_count: (b_, h_, iq, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1),
                lambda b_, h_, iq, j, kv_list, kv_count: (b_, h_, iq, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_q_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_list, kv_count, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _sparse_bwd_dkv_kernel(
    q_list_ref, q_count_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, softmax_scale, causal, n_q, n_k, block_q, block_k,
):
    ik = pl.program_id(2)
    j = pl.program_id(3)
    n_slots = pl.num_programs(3)
    offset = n_k - n_q
    iq = q_list_ref[ik, j]

    @pl.when(j == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(j < q_count_ref[ik])
    def _update():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]
        di = di_ref[0, 0]
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(softmax_scale)
        mask = _tile_mask(iq, ik, block_q, block_k, n_q, n_k, causal, offset)
        s2 = jnp.where(mask, s2, DEFAULT_MASK_VALUE)
        p = jnp.where(mask, jnp.exp(s2 - lse2), 0.0)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_slots - 1)
    def _store():
        dk_ref[0, 0] = (
            dk_scr[...] * jnp.float32(softmax_scale)
        ).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _sparse_bwd_dq_kernel(
    kv_list_ref, kv_count_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr,
    *, softmax_scale, causal, n_q, n_k, block_q, block_k,
):
    iq = pl.program_id(2)
    j = pl.program_id(3)
    n_slots = pl.num_programs(3)
    offset = n_k - n_q
    ik = kv_list_ref[iq, j]

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    @pl.when(j < kv_count_ref[iq])
    def _update():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]
        di = di_ref[0, 0]
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(softmax_scale)
        mask = _tile_mask(iq, ik, block_q, block_k, n_q, n_k, causal, offset)
        s2 = jnp.where(mask, s2, DEFAULT_MASK_VALUE)
        p = jnp.where(mask, jnp.exp(s2 - lse2), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(j == n_slots - 1)
    def _store():
        dq_ref[0, 0] = (
            dq_scr[...] * jnp.float32(softmax_scale)
        ).astype(dq_ref.dtype)


def _sparse_bwd(
    q, k, v, o, lse, do, kv_list, kv_count, q_list, q_count,
    *, causal, softmax_scale, block_q, block_k, interpret, n_q, n_k,
    dlse=None,
):
    b, h, n_q_pad, d = q.shape
    h_kv = k.shape[1]
    groups = h // h_kv
    n_k_pad = k.shape[2]
    # LSE cotangent folds into di: ds = p * (dp - (di - dlse)).
    di = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    if dlse is not None:
        di = di - dlse.astype(jnp.float32)
    common = dict(
        softmax_scale=softmax_scale, causal=causal, n_q=n_q, n_k=n_k,
        block_q=block_q, block_k=block_k,
    )

    def idx_q(b_, h_, i, j, lst, cnt):
        return (b_, h_, lst[i, j], 0)

    def idx_self(b_, h_, i, j, lst, cnt):
        return (b_, h_, i, 0)

    def idx_kv(b_, h_, i, j, lst, cnt):
        # GQA: KV tensors carry h_kv heads; q-head h_ reads h_ // groups.
        return (b_, h_ // groups, lst[i, j], 0)

    def idx_kv_self(b_, h_, i, j, lst, cnt):
        return (b_, h_ // groups, i, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_sparse_bwd_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, n_k_pad // block_k, q_list.shape[1]),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), idx_q),
                pl.BlockSpec((1, 1, block_k, d), idx_kv_self),
                pl.BlockSpec((1, 1, block_k, d), idx_kv_self),
                pl.BlockSpec((1, 1, block_q, d), idx_q),
                pl.BlockSpec((1, 1, block_q, 1), idx_q),
                pl.BlockSpec((1, 1, block_q, 1), idx_q),
            ],
            out_specs=[
                # per *query* head; group-summed below (no atomics on TPU)
                pl.BlockSpec((1, 1, block_k, d), idx_self),
                pl.BlockSpec((1, 1, block_k, d), idx_self),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n_k_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_k_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_list, q_count, q, k, v, do, lse, di)
    if groups > 1:
        dk = dk.reshape(b, h_kv, groups, n_k_pad, d).sum(axis=2)
        dv = dv.reshape(b, h_kv, groups, n_k_pad, d).sum(axis=2)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)

    dq = pl.pallas_call(
        functools.partial(_sparse_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, n_q_pad // block_q, kv_list.shape[1]),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), idx_self),
                pl.BlockSpec((1, 1, block_k, d), idx_kv),
                pl.BlockSpec((1, 1, block_k, d), idx_kv),
                pl.BlockSpec((1, 1, block_q, d), idx_self),
                pl.BlockSpec((1, 1, block_q, 1), idx_self),
                pl.BlockSpec((1, 1, block_q, 1), idx_self),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), idx_self),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_list, kv_count, q, k, v, do, lse, di)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp + public entry
# ---------------------------------------------------------------------------


def _pad_seq(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _sparse_attention(
    q, k, v, pattern, causal, softmax_scale, block_q, block_k, interpret
):
    return _sparse_attention_fwd(
        q, k, v, pattern, causal, softmax_scale, block_q, block_k, interpret
    )[0]


def _lists_for(pattern, n_q_tiles, n_k_tiles, block_q, block_k, causal, offset):
    active = _tile_pattern(
        pattern, n_q_tiles, n_k_tiles, block_q, block_k, causal, offset
    )
    kv_list, kv_count = _compact_rows(active)
    q_list, q_count = _compact_rows(active.T)
    return kv_list, kv_count, q_list, q_count


def _sparse_attention_fwd(
    q, k, v, pattern, causal, softmax_scale, block_q, block_k, interpret
):
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    qp = _pad_seq(q, 2, block_q)
    kp = _pad_seq(k, 2, block_k)
    vp = _pad_seq(v, 2, block_k)
    n_q_tiles = qp.shape[2] // block_q
    n_k_tiles = kp.shape[2] // block_k
    kv_list, kv_count, q_list, q_count = _lists_for(
        pattern, n_q_tiles, n_k_tiles, block_q, block_k, causal, n_k - n_q
    )
    o, lse = _sparse_fwd(
        qp, kp, vp, kv_list, kv_count, causal=causal,
        softmax_scale=softmax_scale, block_q=block_q, block_k=block_k,
        interpret=interpret, n_q=n_q, n_k=n_k,
    )
    o_out = o[:, :, :n_q, :]
    lse_out = lse[:, :, :n_q, 0]
    return (o_out, lse_out), (q, k, v, pattern, o_out, lse_out)


def _sparse_attention_bwd(
    causal, softmax_scale, block_q, block_k, interpret, residuals, cotangents
):
    q, k, v, pattern, o, lse = residuals
    do, dlse = cotangents
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    qp = _pad_seq(q, 2, block_q)
    kp = _pad_seq(k, 2, block_k)
    vp = _pad_seq(v, 2, block_k)
    op = _pad_seq(o, 2, block_q)
    dop = _pad_seq(do, 2, block_q)
    lsep = jnp.pad(
        lse, [(0, 0), (0, 0), (0, qp.shape[2] - n_q)], constant_values=1e9
    )[..., None]
    dlsep = jnp.pad(
        dlse, [(0, 0), (0, 0), (0, qp.shape[2] - n_q)]
    )[..., None]
    n_q_tiles = qp.shape[2] // block_q
    n_k_tiles = kp.shape[2] // block_k
    kv_list, kv_count, q_list, q_count = _lists_for(
        pattern, n_q_tiles, n_k_tiles, block_q, block_k, causal, n_k - n_q
    )
    dq, dk, dv = _sparse_bwd(
        qp, kp, vp, op, lsep, dop, kv_list, kv_count, q_list, q_count,
        causal=causal, softmax_scale=softmax_scale, block_q=block_q,
        block_k=block_k, interpret=interpret, n_q=n_q, n_k=n_k, dlse=dlsep,
    )
    return (
        dq[:, :, :n_q].astype(q.dtype),
        dk[:, :, :n_k].astype(k.dtype),
        dv[:, :, :n_k].astype(v.dtype),
        None,
    )


_sparse_attention.defvjp(_sparse_attention_fwd, _sparse_attention_bwd)


def pallas_sparse_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pattern: jax.Array | None,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Block-sparse flash attention. ``pattern`` is a bool
    (ceil(N_q/block_q), ceil(N_k/block_k)) tile map; True = attend.
    Inactive tiles are skipped at the DMA level (compacted grid).

    Query rows with no active tiles return 0 with lse = -inf (the reference
    L6 semantics: fully-masked rows contribute nothing).
    """
    if q.ndim != 4:
        raise ValueError(f"expected (B, H, N, D), got {q.shape}")
    if softmax_scale is None:
        softmax_scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = _interpret_default()
    return _sparse_attention(
        q, k, v, pattern, causal, float(softmax_scale), int(block_q),
        int(block_k), bool(interpret),
    )
