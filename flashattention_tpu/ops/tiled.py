"""Tiled online-softmax attention as a pure-XLA program.

The always-runs-anywhere executor (CPU/GPU/TPU via XLA) — the TPU-native
analogue of the reference's pure-torch backends (src/fa1/torch/impl.py,
src/fa2/torch/impl.py, src/fa3/torch/impl.py), built the JAX way: a
``lax.scan`` over KV tiles instead of Python loops, one fused jit program
instead of per-(bh, tile) eager dispatch.

Math notes (vs. the reference):
- Deferred normalization done *correctly*: divide by ``l`` exactly once at the
  end (the reference's FA2 torch path divides twice — bug B2, SURVEY.md §2.6).
- Backward recomputes ``P = exp(S - lse)`` from the saved LSE (the reference's
  FA1 backward, src/fa1/torch/impl.py:70-115, which is the *correct* one;
  FA2's python backward has bug B3) and accumulates dk across Q contributions.
- Causal/padding masks are built from absolute row/col indices (kills bug B1).
- All accumulation in fp32 (reference invariant).

Extras the reference only has in its L6 model (flashattention_pytorch.py):
- attention dropout with deterministic per-tile mask replay in the backward
  (reference saves mask lists, ln 294-308/399-409; we regenerate them from a
  folded PRNG key — O(1) memory instead of O(N^2/bc) masks),
- block-sparse masking via an elementwise mask argument (ln 124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _pad_kv(k: jax.Array, v: jax.Array, block_k: int):
    n_k = k.shape[-2]
    n_pad = (-n_k) % block_k
    if n_pad:
        pad = [(0, 0)] * (k.ndim - 2) + [(0, n_pad), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    return k, v, n_k


def _tile_kv(x: jax.Array, block_k: int) -> jax.Array:
    """(B, H, Nk_pad, D) -> (n_tiles, B, H, block_k, D) for lax.scan."""
    b, h, n, d = x.shape
    return jnp.moveaxis(x.reshape(b, h, n // block_k, block_k, d), 2, 0)


def _tile_scores_mask(
    *,
    j: jax.Array,
    block_k: int,
    n_q: int,
    n_k: int,
    causal: bool,
    mask_tile: jax.Array | None,
    qoff: jax.Array | None = None,
) -> jax.Array | None:
    """Boolean (n_q, block_k) mask for KV tile ``j``; None if nothing masks.

    ``qoff``: absolute key position of query row 0 (row r attends cols <=
    r + qoff); None means the bottom-aligned default n_k - n_q."""
    col0 = j * block_k
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (n_q, block_k), 1)
    m = None
    if n_k % block_k:
        m = cols < n_k
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_q, block_k), 0)
        offset = (n_k - n_q) if qoff is None else qoff
        cm = cols <= rows + offset
        m = cm if m is None else (m & cm)
    if mask_tile is not None:
        m = mask_tile if m is None else (m & mask_tile)
    return m


def _dropout_keep(key, j, shape, rate):
    """Deterministic per-tile keep mask — regenerated identically in fwd/bwd."""
    tile_key = jax.random.fold_in(key, j)
    return jax.random.bernoulli(tile_key, 1.0 - rate, shape)


def _tile_alibi(slopes, j, block_k, n_q, qoff):
    """ALiBi bias for KV tile ``j``: (1, H, n_q, block_k) fp32.

    Computed from indices per scan step — O(H*n_q*block_k) live at a time,
    never an O(H*N^2) HBM operand (the same in-kernel design as
    pallas_attn._alibi_tile_bias; row r sits at key position r + qoff)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_q, block_k), 0) + qoff
    cols = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (n_q, block_k), 1
    )
    dist = jnp.abs(cols - rows).astype(jnp.float32)
    return -slopes[None, :, None, None] * dist[None, None]


# ---------------------------------------------------------------------------
# custom_vjp core
# ---------------------------------------------------------------------------
# Primal args: q, k, v, mask, dropout_key, qoff, slopes.
# Static args: causal, softmax_scale, block_k, dropout_rate, has_mask,
#              has_dropout, softcap, has_alibi.


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14)
)
def _tiled_attention(
    q, k, v, mask, dropout_key, qoff, slopes, causal, softmax_scale,
    block_k, dropout_rate, has_mask, has_dropout, softcap, has_alibi,
):
    o, lse = _tiled_fwd(
        q, k, v, mask, dropout_key, qoff, slopes, causal, softmax_scale,
        block_k, dropout_rate, has_mask, has_dropout, softcap, has_alibi,
    )
    return o, lse


def _tiled_fwd(
    q, k, v, mask, dropout_key, qoff, slopes, causal, softmax_scale,
    block_k, dropout_rate, has_mask, has_dropout, softcap, has_alibi,
):
    b, h, n_q, d = q.shape
    k, v, n_k = _pad_kv(k, v, block_k)
    k_tiles = _tile_kv(k, block_k)
    v_tiles = _tile_kv(v, block_k)
    n_tiles = k_tiles.shape[0]

    qf = q.astype(jnp.float32)

    def body(carry, inputs):
        m_i, l_i, acc = carry
        j, k_j, v_j = inputs
        s = (
            jnp.einsum("bhqd,bhkd->bhqk", qf, k_j.astype(jnp.float32))
            * softmax_scale
        )
        if has_alibi:
            s = s + _tile_alibi(slopes, j, block_k, n_q, qoff)
        if softcap is not None:
            # Cap BEFORE masking — tanh saturates the mask fill value.
            s = softcap * jnp.tanh(s / softcap)
        mask_tile = None
        if has_mask:
            mask_tile = jax.lax.dynamic_slice_in_dim(
                mask, j * block_k, block_k, axis=-1
            )
        tm = _tile_scores_mask(
            j=j, block_k=block_k, n_q=n_q, n_k=n_k, causal=causal,
            mask_tile=mask_tile, qoff=qoff,
        )
        if tm is not None:
            s = jnp.where(tm, s, DEFAULT_MASK_VALUE)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new[..., None])
        if tm is not None:
            # Exact zeroing: a fully-masked row otherwise has m == the mask
            # fill value and p == 1 everywhere — a bogus uniform average
            # (same fix as the Pallas kernels).
            p = jnp.where(tm, p, 0.0)
        l_new = alpha * l_i + jnp.sum(p, axis=-1)
        p_v = p
        if has_dropout:
            keep = _dropout_keep(dropout_key, j, p.shape, dropout_rate)
            p_v = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        acc_new = alpha[..., None] * acc + jnp.einsum(
            "bhqk,bhkd->bhqd", p_v, v_j.astype(jnp.float32)
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, h, n_q), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, n_q), jnp.float32)
    acc0 = jnp.zeros((b, h, n_q, d), jnp.float32)
    (m_i, l_i, acc), _ = jax.lax.scan(
        body, (m0, l0, acc0), (jnp.arange(n_tiles), k_tiles, v_tiles)
    )

    l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
    o = (acc / l_safe[..., None]).astype(q.dtype)
    lse = m_i + jnp.log(l_safe)
    return o, lse


def _tiled_fwd_vjp(
    q, k, v, mask, dropout_key, qoff, slopes, causal, softmax_scale,
    block_k, dropout_rate, has_mask, has_dropout, softcap, has_alibi,
):
    o, lse = _tiled_fwd(
        q, k, v, mask, dropout_key, qoff, slopes, causal, softmax_scale,
        block_k, dropout_rate, has_mask, has_dropout, softcap, has_alibi,
    )
    return (o, lse), (q, k, v, mask, dropout_key, qoff, slopes, o, lse)


def _tiled_bwd(
    causal, softmax_scale, block_k, dropout_rate, has_mask, has_dropout,
    softcap, has_alibi, residuals, cotangents,
):
    q, k, v, mask, dropout_key, qoff, slopes, o, lse = residuals
    do, dlse = cotangents

    b, h, n_q, d = q.shape
    k_p, v_p, n_k = _pad_kv(k, v, block_k)
    k_tiles = _tile_kv(k_p, block_k)
    v_tiles = _tile_kv(v_p, block_k)
    n_tiles = k_tiles.shape[0]

    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    # di = rowsum(o * do) — shared by dq and dk paths (reference
    # src/fa1/torch/impl.py:84 ``dvec``; JAX flash bwd's ``di``). The LSE
    # cotangent folds in exactly (d lse_i / d s_ij = p_ij, pre-dropout):
    # ds = p * (dp - di + dlse) == p * (dp - (di - dlse)) — same identity as
    # pallas_attn._flash_bwd.
    di = jnp.sum(o.astype(jnp.float32) * dof, axis=-1)
    di = di - dlse.astype(jnp.float32)

    def body(dq_acc, inputs):
        j, k_j, v_j = inputs
        kf = k_j.astype(jnp.float32)
        vf = v_j.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * softmax_scale
        if has_alibi:
            # Additive and q/k-independent: no extra chain terms in ds.
            s = s + _tile_alibi(slopes, j, block_k, n_q, qoff)
        if softcap is not None:
            tcap = jnp.tanh(s / softcap)
            s = softcap * tcap
        mask_tile = None
        if has_mask:
            mask_tile = jax.lax.dynamic_slice_in_dim(
                mask, j * block_k, block_k, axis=-1
            )
        tm = _tile_scores_mask(
            j=j, block_k=block_k, n_q=n_q, n_k=n_k, causal=causal,
            mask_tile=mask_tile, qoff=qoff,
        )
        if tm is not None:
            s = jnp.where(tm, s, DEFAULT_MASK_VALUE)
        p = jnp.exp(s - lse[..., None])
        if tm is not None:
            p = jnp.where(tm, p, 0.0)  # see forward note
        if has_dropout:
            keep = _dropout_keep(dropout_key, j, p.shape, dropout_rate)
            p_v = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_v = p
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p_v, dof)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
        if has_dropout:
            dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
        ds = p * (dp - di[..., None])
        if softcap is not None:
            ds = ds * (1.0 - tcap * tcap)  # chain through the cap
        ds = ds * softmax_scale
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, h, n_q, d), jnp.float32)
    dq, (dk_tiles, dv_tiles) = jax.lax.scan(
        body, dq0, (jnp.arange(n_tiles), k_tiles, v_tiles)
    )
    dk = jnp.moveaxis(dk_tiles, 0, 2).reshape(b, h, n_tiles * block_k, d)
    dv = jnp.moveaxis(dv_tiles, 0, 2).reshape(b, h, n_tiles * block_k, d)
    dk = dk[:, :, :n_k].astype(k.dtype)
    dv = dv[:, :, :n_k].astype(v.dtype)
    dq = dq.astype(q.dtype)

    residual_mask, residual_key = residuals[3], residuals[4]
    return (
        dq, dk, dv, _float0_like(residual_mask), _float0_like(residual_key),
        _float0_like(residuals[5]),
        # slopes are float (inexact): cotangent must be a zero float array,
        # not float0 — ALiBi slopes are positional constants, never trained.
        jnp.zeros_like(residuals[6]),
    )


_tiled_attention.defvjp(_tiled_fwd_vjp, _tiled_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def tiled_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    block_k: int = 128,
    mask: jax.Array | None = None,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    q_offset: jax.Array | int | None = None,
    softcap: float | None = None,
    alibi_slopes: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Tiled online-softmax attention (XLA executor).

    ``softcap``: logit soft-capping — scaled scores become
    softcap * tanh(s / softcap) before masking (see pallas_attention).

    ``alibi_slopes``: (H,) per-head ALiBi slopes — the bias
    -slope_h * |key_pos(col) - key_pos(row)| is built per KV tile inside
    the scan (O(H*N*block_k) live at a time), so the xla backend no longer
    needs an O(H*N^2) dense bias operand for ALiBi (round-3 fix; the dense
    oracle fallback remains only for the ``reference`` backend).

    Args:
      q, k, v: (B, H, N, D); q may have a different N than k/v (decode).
      mask: optional bool (N_q, N_k) elementwise mask; True = attend. Used for
        block-sparse patterns (reference flashattention_pytorch.py:124).
      dropout_rate/dropout_key: attention-weight dropout with inverted scaling
        (reference flashattention_pytorch.py:149-156); the mask is regenerated
        deterministically per tile in the backward.
      q_offset: absolute key position of query row 0 under causal (row r
        attends cols <= r + q_offset; may be traced). Default n_k - n_q.

    Returns:
      (o, lse) with o in q.dtype, lse fp32 (B, H, N_q).
    """
    *_, d = q.shape
    if softmax_scale is None:
        softmax_scale = d ** -0.5
    has_dropout = dropout_rate > 0.0
    if has_dropout and dropout_key is None:
        raise ValueError("dropout_rate > 0 requires dropout_key")
    has_mask = mask is not None
    if mask is None:
        mask = jnp.ones((1, 1), dtype=bool)  # placeholder, never read
    else:
        n_pad = (-k.shape[-2]) % block_k
        if mask.shape[-1] != k.shape[-2] or mask.shape[-2] != q.shape[-2]:
            raise ValueError(
                f"mask must end in (N_q, N_k)=({q.shape[-2]}, {k.shape[-2]}), "
                f"got {mask.shape}"
            )
        if mask.ndim not in (2, 4):
            # 2-D (N_q, N_k) shared, or 4-D (B|1, H|1, N_q, N_k) per
            # batch/head (e.g. the segment-id fold, ops/api.py) — the scan
            # body broadcasts either against (B, H, N_q, block_k) scores.
            raise ValueError(f"mask must be 2-D or 4-D, got {mask.shape}")
        if n_pad:
            mask = jnp.pad(
                mask, [(0, 0)] * (mask.ndim - 1) + [(0, n_pad)]
            )
    if dropout_key is None:
        dropout_key = jax.random.key(0)
    if q_offset is None:
        q_offset = k.shape[-2] - q.shape[-2]
    qoff = jnp.asarray(q_offset, jnp.int32)
    has_alibi = alibi_slopes is not None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).ravel()
        if slopes.shape != (q.shape[1],):
            raise ValueError(
                f"alibi_slopes must be (H,)=({q.shape[1]},), "
                f"got {slopes.shape}"
            )
    else:
        slopes = jnp.zeros((1,), jnp.float32)  # placeholder, never read
    return _tiled_attention(
        q, k, v, mask, dropout_key, qoff, slopes, causal,
        float(softmax_scale), int(block_k), float(dropout_rate), has_mask,
        has_dropout, float(softcap) if softcap is not None else None,
        has_alibi,
    )
