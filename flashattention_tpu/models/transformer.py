"""Decoder-only transformer LM on the flash-attention kernel library.

Functional re-design of the reference's GPT-style model
(src/fa3/torch/flashattention_pytorch.py):

- ``Embedding``/``PositionalEncoding`` (ln 620-647): token embedding scaled
  by sqrt(d_model) + learned positional embeddings (init std 0.02).
- ``MultiHeadAttention`` (ln 18-92): fused QKV projection (w_qkv: d -> 3d,
  ln 31), temperature ``tau``, optional block-sparse mask (ln 77-78),
  attention dropout — all routed through the framework's flash kernels
  instead of the reference's hand-rolled tiled loops.
- ``Decoder``/``DecoderStack`` (ln 192-226): post-LN blocks
  (MHA -> residual+LN -> FFN -> residual+LN).
- ``look_ahead_mask_`` (ln 176-190): causal masking with q_len != k_len via
  the kernels' absolute-index offset math (KV-cache decode).
- ``Transformer`` (ln 649-675): tok-emb -> pos-enc -> N blocks -> lm head.

Params are plain nested dicts (pytrees): everything jits, shards with pjit /
shard_map, and checkpoints with orbax without framework glue.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

from flashattention_tpu.ops.api import flash_attention
from flashattention_tpu.ops.tiled import tiled_attention

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Reference FlashAttentionConfig (flashattention_pytorch.py:679-711):
    GPT-3-small-ish defaults."""

    vocab_size: int = 50257
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    n_kv_heads: int | None = None  # GQA/MQA; None -> MHA (= n_heads)
    fused_qkv: bool = True         # single w_qkv vs separate w_q/w_k/w_v
                                   # (reference supports both, ln 18-92)
    d_ff: int = 3072
    max_seq_len: int = 512
    dropout_rate: float = 0.1
    block_size: int = 128          # attention tile size (reference ln 706)
    tau: float | None = None       # softmax temperature; default sqrt(d_head)
    pos_encoding: str = "learned"  # "learned" (reference ln 620-647) |
                                   # "rope" (rotary q/k, no pos table) |
                                   # "none"
    rope_theta: float = 10000.0
    attention_window: int | None = None  # sliding-window (local) attention:
                                   # each position attends to the last
                                   # `window` tokens only (Pallas skips
                                   # out-of-band tiles; O(N*W) work)
    attn_softcap: float | None = None  # logit soft-capping: scores become
                                   # softcap*tanh(s/softcap) (Gemma-2-style)
    attention_sinks: int = 0       # StreamingLLM: with attention_window,
                                   # the first `sinks` tokens stay visible
                                   # to every position
    loss_chunk: int | None = None  # chunked cross entropy: compute logits
                                   # (B, chunk, V) per scan step instead of
                                   # materializing (B, N, V) (HBM saver for
                                   # big vocab; models/train.py loss_fn)
    moe_experts: int = 0           # >0: every block's MLP becomes a top-k
                                   # mixture of this many experts
                                   # (models/moe.py; EP over 'model' axis)
    moe_top_k: int = 2             # experts per token (Switch: 1)
    moe_capacity_factor: float = 1.25  # per-expert slots = ceil(G*k*cf/E)
                                   # (TRAIN only — inference is dropless)
    moe_group_size: int = 512      # routing-group tokens (keeps dispatch
                                   # tensors linear in N; GShard grouping)
    moe_aux_coef: float = 0.01     # load-balance loss weight (train.py)
    dtype: Any = jnp.bfloat16      # activation/compute dtype
    param_dtype: Any = jnp.float32
    attention_backend: str = "auto"
    remat: bool = True             # jax.checkpoint each block (HBM saver)
    remat_policy: str = "full"     # "full": save nothing, recompute the
                                   # whole block in backward (max HBM
                                   # savings, ~+2P FLOPs/token recompute);
                                   # "dots": save non-batched matmul
                                   # outputs (MLP/QKV projections),
                                   # recompute only elementwise — the
                                   # attention custom_vjp stays a remat
                                   # unit either way (its kernel does its
                                   # own internal recompute-S)

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def qkv_dim(self) -> int:
        """Fused QKV projection width: H·dh + 2·H_kv·dh."""
        return (self.n_heads + 2 * self.kv_heads) * self.d_head

    @property
    def softmax_scale(self) -> float:
        # tau temperature (reference ln 81-87); default 1/sqrt(d_head).
        return 1.0 / self.tau if self.tau else self.d_head ** -0.5


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense_init(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _init_moe(key, cfg, out_scale):
    from flashattention_tpu.models.moe import init_moe_mlp

    return init_moe_mlp(key, cfg, out_scale)


def init_transformer(key: jax.Array, cfg: TransformerConfig) -> Params:
    if cfg.pos_encoding not in ("learned", "rope", "none"):
        raise ValueError(f"unknown pos_encoding {cfg.pos_encoding!r}")
    if cfg.pos_encoding == "rope" and cfg.d_head % 2:
        raise ValueError("rope needs an even d_head")
    if cfg.attention_window is not None and cfg.attention_window < 1:
        raise ValueError("attention_window must be >= 1")
    if cfg.attention_sinks and cfg.attention_window is None:
        raise ValueError("attention_sinks require attention_window")
    keys = jax.random.split(key, 4 + cfg.n_layers)
    pd = cfg.param_dtype
    d, dff = cfg.d_model, cfg.d_ff
    params: Params = {
        "tok_emb": _dense_init(keys[0], (cfg.vocab_size, d), pd),
        "lm_head": {
            "w": _dense_init(keys[2], (d, cfg.vocab_size), pd),
            "b": jnp.zeros((cfg.vocab_size,), pd),
        },
        "final_ln": {"g": jnp.ones((d,), pd), "b": jnp.zeros((d,), pd)},
        "blocks": [],
    }
    if cfg.pos_encoding == "learned":
        params["pos_emb"] = _dense_init(keys[1], (cfg.max_seq_len, d), pd)
    for i in range(cfg.n_layers):
        bk = jax.random.split(keys[4 + i], 6)
        # residual-branch projections scaled down by depth (GPT-2 init)
        out_scale = 0.02 / math.sqrt(2 * cfg.n_layers)
        params["blocks"].append(
            {
                "attn": (
                    {
                        # fused QKV (reference w_qkv, ln 31); GQA shrinks
                        # the K/V slices to n_kv_heads * d_head each.
                        "w_qkv": _dense_init(bk[0], (d, cfg.qkv_dim), pd),
                        "b_qkv": jnp.zeros((cfg.qkv_dim,), pd),
                        "w_o": _dense_init(bk[1], (d, d), pd, out_scale),
                        "b_o": jnp.zeros((d,), pd),
                    }
                    if cfg.fused_qkv else
                    {
                        # separate projections (reference ln 37-43)
                        "w_q": _dense_init(bk[0], (d, cfg.n_heads * cfg.d_head), pd),
                        "b_q": jnp.zeros((cfg.n_heads * cfg.d_head,), pd),
                        "w_k": _dense_init(bk[4], (d, cfg.kv_heads * cfg.d_head), pd),
                        "b_k": jnp.zeros((cfg.kv_heads * cfg.d_head,), pd),
                        "w_v": _dense_init(bk[5], (d, cfg.kv_heads * cfg.d_head), pd),
                        "b_v": jnp.zeros((cfg.kv_heads * cfg.d_head,), pd),
                        "w_o": _dense_init(bk[1], (d, d), pd, out_scale),
                        "b_o": jnp.zeros((d,), pd),
                    }
                ),
                "ln1": {"g": jnp.ones((d,), pd), "b": jnp.zeros((d,), pd)},
                "mlp": (
                    {
                        "w_in": _dense_init(bk[2], (d, dff), pd),
                        "b_in": jnp.zeros((dff,), pd),
                        "w_out": _dense_init(bk[3], (dff, d), pd, out_scale),
                        "b_out": jnp.zeros((d,), pd),
                    }
                    if cfg.moe_experts == 0 else
                    _init_moe(bk[2], cfg, out_scale)
                ),
                "ln2": {"g": jnp.ones((d,), pd), "b": jnp.zeros((d,), pd)},
            }
        )
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def lm_head_logits(lm: Params, x: jax.Array) -> jax.Array:
    """fp32 LM-head projection — ONE definition shared by the dense
    forward, KV-cache decode and the pipelined forward (parallel/
    pipeline.py), so head changes can't silently diverge between them."""
    return (x.astype(jnp.float32) @ lm["w"].astype(jnp.float32)
            + lm["b"].astype(jnp.float32))


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(
        x.dtype
    )


def block_sparse_mask(
    n_q: int, n_k: int, block: int, pattern: jax.Array
) -> jax.Array:
    """Expand an (n_q_blocks, n_k_blocks) tile pattern to an elementwise
    (n_q, n_k) bool mask (reference block_sparse_mask, ln 124): every tile
    entry covers exactly ``block`` rows/cols so the expansion lines up with
    the kernel tile boundaries even when n is not a tile multiple."""
    if pattern.shape[0] * block < n_q or pattern.shape[1] * block < n_k:
        raise ValueError(
            f"pattern {pattern.shape} x block {block} cannot cover "
            f"({n_q}, {n_k})"
        )
    m = jnp.repeat(jnp.repeat(pattern.astype(bool), block, 0), block, 1)
    return m[:n_q, :n_k]


def segment_positions(segment_ids: jax.Array) -> jax.Array:
    """Within-segment positions for packed rows: (B, N) int32 ids (contiguous
    runs) -> (B, N) position-in-segment. Each packed document restarts at 0,
    so RoPE / learned positions see the same indices it would get unpacked.
    """
    b, n = segment_ids.shape
    ar = jnp.arange(n, dtype=jnp.int32)
    changed = jnp.concatenate(
        [jnp.ones((b, 1), bool), segment_ids[:, 1:] != segment_ids[:, :-1]],
        axis=1,
    )
    seg_start = jax.lax.cummax(jnp.where(changed, ar[None, :], 0), axis=1)
    return ar[None, :] - seg_start


def _rope(t: jax.Array, pos: jax.Array, theta: float) -> jax.Array:
    """Rotary position embedding (split-half / NeoX layout) on (B, H, N, dh).

    ``pos``: (N,) absolute positions of the rows. fp32 rotation, cast back.
    New scope beyond the reference (learned positions only, ln 620-647):
    rotating K *before* it enters the KV cache makes decode position-correct
    with no pos table and no max_seq_len coupling in the weights.
    """
    half = t.shape[-1] // 2
    freqs = pos[..., :, None].astype(jnp.float32) * (
        theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    )  # (N, half) — or (B, N, half) for per-row positions (serving decode)
    if freqs.ndim == 3:
        freqs = freqs[:, None]  # broadcast over heads
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    t1 = t[..., :half].astype(jnp.float32)
    t2 = t[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1
    ).astype(t.dtype)


def _attention(
    x: jax.Array,
    p: Params,
    cfg: TransformerConfig,
    *,
    dropout_key: jax.Array | None,
    train: bool,
    sparse_mask: jax.Array | None,
    kv_cache: Params | None = None,
    cache_index: jax.Array | None = None,
    segment_ids: jax.Array | None = None,
    positions: jax.Array | None = None,
):
    b, n, d = x.shape
    h, h_kv, dh = cfg.n_heads, cfg.kv_heads, cfg.d_head
    if "w_qkv" in p:
        qkv = x @ p["w_qkv"].astype(x.dtype) + p["b_qkv"].astype(x.dtype)
        q, k, v = jnp.split(qkv, [h * dh, (h + h_kv) * dh], axis=-1)
    else:  # separate projections (reference ln 37-43)
        q = x @ p["w_q"].astype(x.dtype) + p["b_q"].astype(x.dtype)
        k = x @ p["w_k"].astype(x.dtype) + p["b_k"].astype(x.dtype)
        v = x @ p["w_v"].astype(x.dtype) + p["b_v"].astype(x.dtype)

    def heads(t, nh):  # (B, N, nh*dh) -> (B, nh, N, dh)
        return t.reshape(b, -1, nh, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q, h), heads(k, h_kv), heads(v, h_kv)

    if cfg.pos_encoding == "rope":
        if positions is not None:
            pos = positions  # (B, N): packed rows restart per segment
        else:
            start = cache_index if kv_cache is not None else 0
            pos = start + jnp.arange(n)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)  # rotated BEFORE caching

    if kv_cache is not None:
        # Decode: append this step's K/V at cache_index, attend to the prefix.
        k_cache = jax.lax.dynamic_update_slice(
            kv_cache["k"], k.astype(kv_cache["k"].dtype), (0, 0, cache_index, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            kv_cache["v"], v.astype(kv_cache["v"].dtype), (0, 0, cache_index, 0)
        )
        new_cache = {"k": k_cache, "v": v_cache}
        # Mask out not-yet-written cache slots AND future positions: a
        # length mask over absolute positions (the kernels' causal offset
        # handles q_len != k_len, but the cache tail beyond cache_index + n
        # must be excluded explicitly).
        n_cache = k_cache.shape[2]
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n_cache), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n_cache), 0)
        mask = cols <= rows + cache_index
        if cfg.attention_window is not None:
            band = cols > rows + cache_index - cfg.attention_window
            if cfg.attention_sinks:
                band = band | (cols < cfg.attention_sinks)
            mask = mask & band
        kc, vc = k_cache.astype(q.dtype), v_cache.astype(q.dtype)
        if h_kv != h:  # GQA: the tiled executor wants matching head counts
            kc = jnp.repeat(kc, h // h_kv, axis=1)
            vc = jnp.repeat(vc, h // h_kv, axis=1)
        o, _ = tiled_attention(
            q, kc, vc,
            softmax_scale=cfg.softmax_scale,
            block_k=min(cfg.block_size, n_cache),
            mask=mask,
            softcap=cfg.attn_softcap,
        )
    else:
        new_cache = None
        rate = cfg.dropout_rate if train else 0.0
        if sparse_mask is not None and cfg.attention_window is not None:
            raise ValueError(
                "attention_window and a block-sparse pattern cannot combine"
            )
        if sparse_mask is not None and segment_ids is not None:
            raise ValueError(
                "segment_ids (packed varlen) and a block-sparse pattern "
                "cannot combine"
            )
        if (sparse_mask is not None and rate == 0.0
                and cfg.attn_softcap is None):
            # Block-sparse fast path: compacted-grid Pallas kernel — inactive
            # tiles cost neither DMA nor compute (reference L6 only *skips*
            # inside a dense loop, flashattention_pytorch.py:124).
            # attn_softcap routes to the dense-mask fallback below instead:
            # the sparse kernel has no softcap and silently dropping the cap
            # made train (dropout fallback, capped) and eval (sparse path,
            # uncapped) compute DIFFERENT functions (review r5). A native
            # sparse softcap is the perf upgrade path if capped-sparse
            # models become hot.
            from flashattention_tpu.ops.pallas_sparse import (
                pallas_sparse_attention,
            )

            o, _ = pallas_sparse_attention(
                q, k, v, sparse_mask, causal=True,
                softmax_scale=cfg.softmax_scale,
                block_q=cfg.block_size, block_k=cfg.block_size,
            )  # GQA handled natively by the kernel's grouped index maps
        else:
            o, _ = flash_attention(
                q, k, v,
                causal=True,
                softmax_scale=cfg.softmax_scale,
                backend=cfg.attention_backend,
                block_q=cfg.block_size,
                block_k=cfg.block_size,
                mask=(
                    block_sparse_mask(n, n, cfg.block_size, sparse_mask)
                    if sparse_mask is not None else None
                ),
                dropout_rate=rate,
                dropout_key=dropout_key if rate > 0 else None,
                window=cfg.attention_window,
                segment_ids=segment_ids,
                softcap=cfg.attn_softcap,
                sinks=cfg.attention_sinks,
            )

    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = o @ p["w_o"].astype(o.dtype) + p["b_o"].astype(o.dtype)
    return out, new_cache


def _mlp(x, p, cfg):
    """Dense MLP, or the MoE mixture when the block carries a router.
    Inference entry point (KV-cache decode paths): MoE routes DROPLESS —
    exact gated mixture, causal, identical across teacher-forced /
    chunked / one-token decode. Training uses _mlp_aux (capacity drops
    + aux loss)."""
    if "router" in p:
        from flashattention_tpu.models.moe import moe_mlp

        return moe_mlp(x, p, cfg, dropless=True)[0]
    hgelu = jax.nn.gelu(x @ p["w_in"].astype(x.dtype) + p["b_in"].astype(x.dtype))
    return hgelu @ p["w_out"].astype(x.dtype) + p["b_out"].astype(x.dtype)


def _mlp_aux(x, p, cfg, train=False):
    """(y, load-balance aux): MoE layers return their Switch aux loss;
    dense layers return 0 so block code is uniform. ``train=True`` keeps
    capacity drops (EP efficiency semantics); eval routes dropless."""
    if "router" in p:
        from flashattention_tpu.models.moe import moe_mlp

        return moe_mlp(x, p, cfg, dropless=not train)
    return _mlp(x, p, cfg), jnp.zeros((), jnp.float32)


def _dropout(x, key, rate):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _block(x, bp, cfg, *, keys, train, sparse_mask, segment_ids=None,
           positions=None):
    """Returns (x, aux): aux is the MoE load-balance loss contribution
    (0 for dense blocks) so MoE and dense stacks share one code path."""
    # Post-LN (reference Decoder, ln 192-226): sublayer -> residual -> LN.
    attn_out, _ = _attention(
        x, bp["attn"], cfg,
        dropout_key=keys[0], train=train, sparse_mask=sparse_mask,
        segment_ids=segment_ids, positions=positions,
    )
    if train and cfg.dropout_rate > 0:
        attn_out = _dropout(attn_out, keys[1], cfg.dropout_rate)
    x = _layer_norm(x + attn_out, bp["ln1"])
    mlp_out, aux = _mlp_aux(x, bp["mlp"], cfg, train=train)
    if train and cfg.dropout_rate > 0:
        mlp_out = _dropout(mlp_out, keys[2], cfg.dropout_rate)
    return _layer_norm(x + mlp_out, bp["ln2"]), aux


def apply_transformer(
    params: Params,
    tokens: jax.Array,
    cfg: TransformerConfig,
    *,
    train: bool = False,
    dropout_key: jax.Array | None = None,
    sparse_pattern: jax.Array | None = None,
    segment_ids: jax.Array | None = None,
    return_hidden: bool = False,
    return_aux: bool = False,
) -> jax.Array:
    """tokens (B, N) int32 -> logits (B, N, vocab) in fp32.

    ``return_hidden=True`` returns the final-LN hidden states (B, N, D)
    instead of logits (the chunked-CE loss applies the LM head itself).

    ``return_aux=True`` additionally returns the summed MoE load-balance
    aux loss (fp32 scalar, 0 for dense models) as a second output —
    models/train.py adds cfg.moe_aux_coef * aux when cfg.moe_experts > 0.

    ``segment_ids``: (B, N) int32 — packed-varlen rows (several documents
    per row, contiguous runs of one id each). Attention stays within each
    segment (kernel-level id compare, ops/api.flash_attention) and both
    position encodings restart at 0 per segment, so a packed forward equals
    the per-document forwards. The reference has no packing; this is the
    flash-attn cu_seqlens training capability, done the TPU way (static
    shapes, no ragged tensors).
    """
    b, n = tokens.shape
    positions = None
    if segment_ids is not None:
        positions = segment_positions(segment_ids)
    x = params["tok_emb"][tokens].astype(cfg.dtype) * math.sqrt(cfg.d_model)
    if cfg.pos_encoding == "learned":
        if positions is not None:
            x = x + params["pos_emb"][positions].astype(cfg.dtype)
        else:
            x = x + params["pos_emb"][:n].astype(cfg.dtype)
    if train and cfg.dropout_rate > 0:
        dropout_key, sub = jax.random.split(dropout_key)
        x = _dropout(x, sub, cfg.dropout_rate)

    sparse_mask = None
    if sparse_pattern is not None:
        # Normalize the user pattern to kernel-tile granularity
        # (ceil(n/block) x ceil(n/block)); _attention expands it further if
        # the elementwise-mask fallback path is taken.
        n_tiles = -(-n // cfg.block_size)
        reps_q = -(-n_tiles // sparse_pattern.shape[0])
        reps_k = -(-n_tiles // sparse_pattern.shape[1])
        sparse_mask = jnp.repeat(
            jnp.repeat(sparse_pattern.astype(bool), reps_q, 0), reps_k, 1
        )[:n_tiles, :n_tiles]

    def one_block(x, bp, keys):
        return _block(x, bp, cfg, keys=keys, train=train,
                      sparse_mask=sparse_mask, segment_ids=segment_ids,
                      positions=positions)

    if cfg.remat:
        if cfg.remat_policy == "dots":
            # Save projection/MLP matmul outputs; recompute elementwise
            # (LN, GELU, residual adds). Batched dots (attention planes)
            # are never saved — flash attention's custom_vjp carries its
            # own O(N) residuals regardless of remat policy.
            block_fn = jax.checkpoint(
                one_block,
                policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable,
            )
        elif cfg.remat_policy == "full":
            block_fn = jax.checkpoint(one_block)
        else:
            raise ValueError(
                f"remat_policy must be 'full' or 'dots', "
                f"got {cfg.remat_policy!r}"
            )
    else:
        block_fn = one_block

    keys = (
        list(jax.random.split(dropout_key, 3 * cfg.n_layers))
        if (train and cfg.dropout_rate > 0)
        else [None] * (3 * cfg.n_layers)
    )
    aux_total = jnp.zeros((), jnp.float32)
    for i, bp in enumerate(params["blocks"]):
        x, aux = block_fn(x, bp, tuple(keys[3 * i: 3 * i + 3]))
        aux_total = aux_total + aux
    x = _layer_norm(x, params["final_ln"])
    if return_hidden:
        return (x, aux_total) if return_aux else x
    logits = lm_head_logits(params["lm_head"], x)
    return (logits, aux_total) if return_aux else logits


# ---------------------------------------------------------------------------
# KV-cache decode
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: TransformerConfig, batch: int, max_len: int | None = None,
    dtype=None,
) -> list[Params]:
    max_len = max_len or cfg.max_seq_len
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.kv_heads, max_len, cfg.d_head)
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(cfg.n_layers)
    ]


def _decode_chunk_impl(params, caches, tokens, cache_index, cfg):
    """Shared body of decode_step/decode_chunk (pure; callers jit)."""
    b, n = tokens.shape
    x = params["tok_emb"][tokens].astype(cfg.dtype) * math.sqrt(cfg.d_model)
    if cfg.pos_encoding == "learned":
        pos = jax.lax.dynamic_slice_in_dim(
            params["pos_emb"], cache_index, n, 0
        )
        x = x + pos.astype(cfg.dtype)

    new_caches = []
    for bp, cache in zip(params["blocks"], caches):
        attn_out, new_cache = _attention(
            x, bp["attn"], cfg,
            dropout_key=None, train=False, sparse_mask=None,
            kv_cache=cache, cache_index=cache_index,
        )
        new_caches.append(new_cache)
        x = _layer_norm(x + attn_out, bp["ln1"])
        mlp_out = _mlp(x, bp["mlp"], cfg)
        x = _layer_norm(x + mlp_out, bp["ln2"])
    x = _layer_norm(x, params["final_ln"])
    return lm_head_logits(params["lm_head"], x), new_caches


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnums=(1,)
)
def decode_step(
    params: Params,
    caches: list[Params],
    tokens: jax.Array,       # (B, 1) current token
    cache_index: jax.Array,  # scalar: write position
    cfg: TransformerConfig,
):
    """One decode step: returns (logits (B, vocab), updated caches)."""
    logits, new_caches = _decode_chunk_impl(
        params, caches, tokens, cache_index, cfg
    )
    return logits[:, -1], new_caches


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnums=(1,)
)
def decode_chunk(
    params: Params,
    caches: list[Params],
    tokens: jax.Array,       # (B, n) chunk appended at cache_index
    cache_index: jax.Array,  # scalar: write position of chunk row 0
    cfg: TransformerConfig,
):
    """Chunk append + causal attention over cache prefix and chunk: returns
    (logits (B, n, vocab) for EVERY chunk row, updated caches). Row j's
    logits are the next-token distribution for absolute position
    cache_index + j + 1 — the verification shape speculative decoding needs
    (serving/speculative.py)."""
    return _decode_chunk_impl(params, caches, tokens, cache_index, cfg)
