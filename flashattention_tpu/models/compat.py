"""Reference-checkpoint migration: run a trained reference ``Transformer``
checkpoint on TPU, unchanged, through this framework's kernels.

The reference trains with per-epoch ``torch.save(model.state_dict())``
(src/fa3/torch/flashattention_pytorch.py:936-960) and ships no loader. A
user switching frameworks carries such a checkpoint; this module accepts the
raw ``state_dict`` mapping and reproduces the reference model's eval-mode
forward *exactly* (fp32 tolerance), including its architectural oddities —
which this framework's own ``models.transformer`` intentionally does not
copy (PARITY.md §2.3):

- embedding scaled by sqrt(d_model) + learned positions
  (flashattention_pytorch.py:620-647),
- post-LN residual order per decoder layer (ln 204-213),
- causal MultiHeadAttention with ``tau * QK^T / sqrt(d_k)`` scoring
  (ln 82-92) — mapped to ``flash_attention(softmax_scale=tau/sqrt(d_k))``,
- the misnamed ``FeedForward`` block, which is really a SECOND,
  NON-causal self-attention (ln 445-486 routes through ForwardPass with
  ``mask=None``; there is no MLP anywhere in the reference model),
- bias-free LM head (ln 663-677).

Scope: inference/eval (the reference's dropout layers are identity in
eval). For training on TPU use ``models.transformer`` + ``models.train``;
``convert_reference_state_dict`` gets existing weights onto this side.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_tpu.models.transformer import _layer_norm
from flashattention_tpu.ops.api import flash_attention

__all__ = [
    "RefConfig",
    "convert_reference_state_dict",
    "apply_reference_transformer",
    "reference_lm_loss",
]


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class RefConfig:
    """Static hyper-parameters of a migrated checkpoint. Registered as a
    static pytree node so the params dict jits directly (the ints stay
    Python values under tracing instead of becoming tracers)."""

    num_heads: int
    d_model: int
    vocab_size: int
    max_len: int
    n_layers: int


def _np(t: Any) -> np.ndarray:
    """torch.Tensor / np.ndarray / array-like -> fp32 numpy (torch-free)."""
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach()
    if hasattr(t, "cpu"):
        t = t.cpu()
    if hasattr(t, "numpy"):
        t = t.numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch ``nn.Linear`` stores weight as (out, in); this side computes
    ``x @ w + b`` so the weight is transposed once here at load time."""
    out = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    bias = sd.get(f"{prefix}.bias")
    if bias is not None:
        out["b"] = jnp.asarray(_np(bias))
    return out


def convert_reference_state_dict(
    state_dict: Mapping[str, Any], num_heads: int
) -> dict:
    """Reference ``Transformer.state_dict()`` -> this framework's pytree.

    ``num_heads`` must be supplied: torch state dicts carry no module
    hyper-parameters and head count is not recoverable from weight shapes.
    Layer count, d_model, vocab and max_len ARE inferred. Per-layer
    fused-vs-separate QKV is detected from key presence (the reference's
    MultiHeadAttention only registers ``w_qkv`` when ``use_fused_qkv``,
    flashattention_pytorch.py:30-36); the unused spare projections it
    registers either way are ignored, matching its forward.
    """
    sd = dict(state_dict)
    tok = _np(sd["token_embedding.emb.weight"])       # (V, d)
    pos = _np(sd["pos_encoding.pos_emb.weight"])      # (max_len, d)
    vocab, d_model = tok.shape
    if d_model % num_heads:
        raise ValueError(f"d_model={d_model} not divisible by num_heads={num_heads}")

    n_layers = 1 + max(
        int(m.group(1))
        for key in sd
        if (m := re.match(r"decoder\.(\d+)\.", key))
    )
    layers = []
    for i in range(n_layers):
        pre = f"decoder.{i}"
        fused = f"{pre}.attn.w_qkv.weight" in sd
        attn: dict = {"o": _linear(sd, f"{pre}.attn.w_o")}
        if fused:
            attn["qkv"] = _linear(sd, f"{pre}.attn.w_qkv")
        else:
            for name in ("q", "k", "v"):
                attn[name] = _linear(sd, f"{pre}.attn.w_{name}")
        ffn = {
            name: _linear(sd, f"{pre}.ffn.w_{name}")
            for name in ("q", "k", "v", "o")
        }
        layers.append({
            "attn": attn,
            "ffn": ffn,
            "ln1": {"g": jnp.asarray(_np(sd[f"{pre}.layer_norm1.weight"])),
                    "b": jnp.asarray(_np(sd[f"{pre}.layer_norm1.bias"]))},
            "ln2": {"g": jnp.asarray(_np(sd[f"{pre}.layer_norm2.weight"])),
                    "b": jnp.asarray(_np(sd[f"{pre}.layer_norm2.bias"]))},
        })

    return {
        "tok_emb": jnp.asarray(tok),
        "pos_emb": jnp.asarray(pos),
        "layers": layers,
        "lm_head": jnp.asarray(_np(sd["fc_out.weight"]).T),  # (d, V), no bias
        "config": RefConfig(
            num_heads=num_heads,
            d_model=d_model,
            vocab_size=vocab,
            max_len=int(pos.shape[0]),
            n_layers=n_layers,
        ),
    }


def _lin(t, p):
    """Apply a converted Linear; _linear omits "b" for bias-free
    checkpoints (nn.Linear(bias=False)), so the forward must treat it as
    optional too — unconditional p["b"] crashed exactly the checkpoints
    the converter accepted (review r5)."""
    out = t @ p["w"]
    return out + p["b"] if "b" in p else out


def _self_attention(x, p, *, num_heads, tau, causal, backend):
    """One reference attention block (MHA ln 41-92 / FeedForward ln 465-486
    share this shape: project, head-split, attend, merge, out-project)."""
    b, n, d = x.shape
    dh = d // num_heads
    if "qkv" in p:
        qkv = _lin(x, p["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = _lin(x, p["q"])
        k = _lin(x, p["k"])
        v = _lin(x, p["v"])

    def heads(t):  # (B, N, d) -> (B, H, N, dh)
        return t.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)

    o, _ = flash_attention(
        heads(q), heads(k), heads(v),
        causal=causal,
        softmax_scale=tau / math.sqrt(dh),
        backend=backend,
    )
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    return _lin(o, p["o"])


def apply_reference_transformer(
    params: dict,
    input_ids: jax.Array,
    *,
    tau: float = 1.0,
    backend: str = "auto",
) -> jax.Array:
    """Eval-mode forward of the reference ``Transformer`` (ln 649-677) on
    this framework's kernels: ``input_ids (B, N) int32 -> logits (B, N, V)``.

    Faithful to the checkpoint's semantics, oddities included: the second
    per-layer block ("ffn") is NON-causal self-attention, exactly as the
    reference computes it (Decoder.forward passes no mask to ``self.ffn``,
    ln 209). jit-compatible; wrap in ``jax.jit`` for repeated use.
    """
    cfg = params["config"]
    b, n = input_ids.shape
    if n > cfg.max_len:
        raise ValueError(
            f"sequence length {n} exceeds checkpoint max_len {cfg.max_len}"
        )
    x = params["tok_emb"][input_ids] * math.sqrt(cfg.d_model)
    x = x + params["pos_emb"][:n]
    for layer in params["layers"]:
        a = _self_attention(
            x, layer["attn"], num_heads=cfg.num_heads, tau=tau,
            causal=True, backend=backend,
        )
        x = _layer_norm(x + a, layer["ln1"])
        # The "ffn" block always runs at tau=1: Decoder.forward passes tau
        # only to the causal MHA; ``self.ffn(x)`` takes the default (ln 209).
        f = _self_attention(
            x, layer["ffn"], num_heads=cfg.num_heads, tau=1.0,
            causal=False, backend=backend,
        )
        x = _layer_norm(x + f, layer["ln2"])
    return x @ params["lm_head"]


def reference_lm_loss(
    params: dict,
    input_ids: jax.Array,
    targets: jax.Array,
    *,
    tau: float = 1.0,
    backend: str = "auto",
) -> jax.Array:
    """Mean next-token cross-entropy of a migrated checkpoint — the
    quantity behind the reference's reported perplexity (its train loop's
    ``criterion(logits.view(-1, V), target_ids.view(-1))``,
    flashattention_pytorch.py:848,898). ``exp()`` of this is perplexity.
    ``ignore_index``-style padding exclusion is the caller's slice."""
    logits = apply_reference_transformer(
        params, input_ids, tau=tau, backend=backend
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return -jnp.mean(picked)
