"""Context parallelism: ring attention and all-gather attention.

The online-softmax m/l merge is associative (reference fa1 torch impl's
running update, src/fa1/torch/impl.py:53-61), so partial attention against
KV shards on different chips merges exactly like KV tiles inside one kernel.
Ring attention rotates KV shards around the ICI ring with ``ppermute`` while
each chip computes the current partial — communication hides behind compute
(SURVEY.md §5.7 plan; scaling-book ring recipe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.api import flash_attention


def _merge_partials(m, l, acc, o_p, lse_p):
    """Merge a normalized partial (o_p, lse_p) into running (m, l, acc).

    Running state: m = running max (B,H,N), l = running sum weight,
    acc = unnormalized output. Final o = acc / l, lse = m + log l.
    """
    m_new = jnp.maximum(m, lse_p)
    alpha = jnp.exp(m - m_new)          # rescale old
    w = jnp.exp(lse_p - m_new)          # weight of the new partial
    l_new = l * alpha + w
    acc_new = acc * alpha[..., None] + o_p.astype(jnp.float32) * w[..., None]
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    softmax_scale: float | None = None,
    backend: str = "auto",
    segment_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Ring attention over a sequence-sharded mesh axis.

    Call inside shard_map with q/k/v sharded on their N dim over
    ``axis_name``. Each step computes a partial against the KV shard
    currently resident, then rotates K/V to the next chip with ppermute;
    after axis_size steps every chip has attended to the full sequence.

    Causal handling per step (shard-granular, like tile-granular skipping
    inside the kernel): KV shards strictly in the past -> full attention;
    the diagonal shard -> causal attention; future shards -> skipped.

    ``segment_ids``: this chip's (B, n_local) slice of the packed-varlen
    ids (long-context training packs documents across shard boundaries).
    The KV-side ids rotate around the ring WITH their K/V shard; each
    partial passes the ``(q_ids, kv_ids)`` pair down to the kernels'
    in-tile id compare.

    Returns local (o, lse) for this chip's query shard.
    """
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, n_local, d_head = q.shape
    if softmax_scale is None:
        softmax_scale = d_head ** -0.5

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def seg_pair(kv_ids):
        return None if segment_ids is None else (segment_ids, kv_ids)

    def partial_full(qkv, kv_ids):
        q_, k_, v_ = qkv
        return flash_attention(
            q_, k_, v_, causal=False, softmax_scale=softmax_scale,
            backend=backend, segment_ids=seg_pair(kv_ids),
        )

    def partial_causal(qkv, src, kv_ids):
        # Shard-granular causal dispatch folded into ONE scalar q_offset
        # (row r attends cols <= r + q_offset): past shards attend fully
        # (offset = +n_local), the diagonal shard uses its true diagonal
        # (offset = 0), future shards attend nothing (offset = -n_local —
        # the kernel's tile-skip predicates see the offset, so no tile
        # runs and lse comes back as -inf). One traced call instead of a
        # lax.switch over kernel branches: differentiable (cond partial-
        # eval can't merge the branches' custom_vjp residuals) and still
        # free of wasted MXU work on the Pallas path.
        q_, k_, v_ = qkv
        offset = jnp.where(
            src < my_idx, n_local, jnp.where(src == my_idx, 0, -n_local)
        )
        return flash_attention(
            q_, k_, v_, causal=True, softmax_scale=softmax_scale,
            backend=backend, q_offset=offset, segment_ids=seg_pair(kv_ids),
        )

    m = jnp.full((b, h, n_local), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, n_local), jnp.float32)
    acc = jnp.zeros((b, h, n_local, d_head), jnp.float32)

    # Double-buffered ring: step j+1's ppermute is ISSUED before step j's
    # attention compute. The transfer's dataflow chain is permute->permute->
    # ...->parameters — no attention op ever gates a transfer (verified on
    # the compiled HLO by scripts/ring_overlap_trace.py), so the scheduler
    # is free to hide every hop behind the concurrent partial's compute.
    k_blk, v_blk = k, v
    ids_blk = segment_ids
    for step in range(n_dev):  # static: n_dev known at trace time
        src = (my_idx - step) % n_dev  # which shard we hold right now
        k_next = v_next = ids_next = None
        if step < n_dev - 1:
            k_next = jax.lax.ppermute(k_blk, axis_name, perm)
            v_next = jax.lax.ppermute(v_blk, axis_name, perm)
            if ids_blk is not None:
                ids_next = jax.lax.ppermute(ids_blk, axis_name, perm)
        if causal:
            o_p, lse_p = partial_causal((q, k_blk, v_blk), src, ids_blk)
        else:
            o_p, lse_p = partial_full((q, k_blk, v_blk), ids_blk)
        m, l, acc = _merge_partials(m, l, acc, o_p, lse_p)
        if k_next is not None:
            k_blk, v_blk, ids_blk = k_next, v_next, ids_next

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (acc / l_safe[..., None]).astype(q.dtype)
    lse = m + jnp.log(l_safe)
    return o, lse


def ring_attention_bidir(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    softmax_scale: float | None = None,
    backend: str = "auto",
    segment_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Bidirectional ring attention: each chip's KV shard is split in half
    and the halves rotate in opposite directions, so every step moves half
    the bytes per direction and uses BOTH ICI links of the ring (the
    scaling-book bidirectional-ring recipe). Same step count as the
    unidirectional ring; per-step communication time is halved on hardware
    where each link direction has independent bandwidth.

    Causal handling is per (half, source-shard): past shards attend fully,
    the diagonal shard uses the kernel's causal path, future shards skip —
    identical math to ``ring_attention``, applied to each direction's
    resident half.
    """
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, n_local, d_head = q.shape
    if softmax_scale is None:
        softmax_scale = d_head ** -0.5
    half = n_local // 2
    if half == 0 or n_local % 2:
        raise ValueError(f"local KV length {n_local} must be even")

    fwd_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    rev_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def partial_against(k_blk, v_blk, src, kv_offset_in_shard, kv_ids=None):
        """Partial attention of the local q against one resident half-shard.

        Shard-granular causal dispatch folds into ONE scalar q_offset (row r
        attends half-local cols c with c <= r + offset): past shards attend
        fully (offset = +half), the diagonal shard uses its true diagonal
        (offset = -kv_offset_in_shard — the kernels' absolute-index mask and
        tile skip, no elementwise-mask fallback), future shards attend
        nothing (offset = -n_local, every tile skipped, lse = -inf). A
        single traced call, unlike a lax.switch over kernel branches, is
        differentiable (cond partial-eval can't merge the branches'
        custom_vjp residuals)."""
        pair = None if segment_ids is None else (segment_ids, kv_ids)
        if not causal:
            return flash_attention(
                q, k_blk, v_blk, causal=False, softmax_scale=softmax_scale,
                backend=backend, segment_ids=pair,
            )
        offset = jnp.where(
            src < my_idx, half,
            jnp.where(src == my_idx, -kv_offset_in_shard, -n_local),
        )
        return flash_attention(
            q, k_blk, v_blk, causal=True, softmax_scale=softmax_scale,
            backend=backend, q_offset=offset, segment_ids=pair,
        )

    k1, k2 = k[:, :, :half], k[:, :, half:]
    v1, v2 = v[:, :, :half], v[:, :, half:]
    ids1 = ids2 = None
    if segment_ids is not None:
        ids1, ids2 = segment_ids[:, :half], segment_ids[:, half:]

    m = jnp.full((b, h, n_local), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, n_local), jnp.float32)
    acc = jnp.zeros((b, h, n_local, d_head), jnp.float32)

    # Double-buffered in both directions: the next halves are requested
    # before this step's compute (see ring_attention's overlap note).
    for step in range(n_dev):  # static
        src1 = (my_idx - step) % n_dev  # half 1 rotates clockwise
        src2 = (my_idx + step) % n_dev  # half 2 rotates counter-clockwise
        nxt = None
        if step < n_dev - 1:
            nxt = (
                jax.lax.ppermute(k1, axis_name, fwd_perm),
                jax.lax.ppermute(v1, axis_name, fwd_perm),
                jax.lax.ppermute(k2, axis_name, rev_perm),
                jax.lax.ppermute(v2, axis_name, rev_perm),
            )
            if segment_ids is not None:
                nxt += (
                    jax.lax.ppermute(ids1, axis_name, fwd_perm),
                    jax.lax.ppermute(ids2, axis_name, rev_perm),
                )
        o1, lse1 = partial_against(k1, v1, src1, 0, ids1)
        o2, lse2 = partial_against(k2, v2, src2, half, ids2)
        m, l, acc = _merge_partials(m, l, acc, o1, lse1)
        m, l, acc = _merge_partials(m, l, acc, o2, lse2)
        if nxt is not None:
            if segment_ids is not None:
                k1, v1, k2, v2, ids1, ids2 = nxt
            else:
                k1, v1, k2, v2 = nxt

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (acc / l_safe[..., None]).astype(q.dtype)
    lse = m + jnp.log(l_safe)
    return o, lse


def all_gather_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    softmax_scale: float | None = None,
    backend: str = "auto",
    segment_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Context parallelism, all-gather variant: gather the full K/V on every
    chip, run local flash attention on the local Q shard. Simpler than the
    ring and optimal when seq_kv is small enough to replicate; causal masking
    uses the global offset of this chip's query shard. ``segment_ids`` (the
    local (B, n_local) slice) is all-gathered alongside K/V for the
    packed-varlen id compare."""
    my_idx = jax.lax.axis_index(axis_name)
    n_local = q.shape[2]
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    pair = None
    if segment_ids is not None:
        ids_full = jax.lax.all_gather(
            segment_ids, axis_name, axis=1, tiled=True
        )
        pair = (segment_ids, ids_full)
    if not causal:
        return flash_attention(
            q, k_full, v_full, causal=False, softmax_scale=softmax_scale,
            backend=backend, segment_ids=pair,
        )
    # Causal with a per-chip offset: query row r sits at global position
    # my_idx * n_local + r. The offset is a *traced* scalar (axis_index),
    # which the kernels accept via their SMEM q_offset — causal tile
    # skipping follows each chip's true diagonal (chip 0 computes 1 shard's
    # worth of KV tiles, the last chip all of them).
    return flash_attention(
        q, k_full, v_full, causal=True, softmax_scale=softmax_scale,
        backend=backend, q_offset=my_idx * n_local, segment_ids=pair,
    )


def make_ring_attention(mesh, *, causal=False, softmax_scale=None,
                        backend: str = "auto"):
    """shard_map-wrapped ring attention: (B, H, N, D) global arrays sharded
    (batch on 'data', sequence on 'context')."""
    from jax.sharding import PartitionSpec as P

    spec = P("data", None, "context", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P("data", None, "context")), check_vma=False,
    )
    def _ring(q, k, v):
        return ring_attention(
            q, k, v, axis_name="context", causal=causal,
            softmax_scale=softmax_scale, backend=backend,
        )

    return _ring
