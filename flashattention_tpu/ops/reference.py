"""Dense attention oracle — the single source of numerical truth.

TPU-native re-design of the reference's ``src/common/correctness.py:5-37``
(``reference_attention`` / ``reference_backward``) and mask helpers
(``src/common/mask.py:3-12``). The reference's ``apply_causal_mask`` derives
block sizes from the score-tensor shape and crashes on 3-D scores (bug B1,
SURVEY.md §2.6); here every mask is built from *absolute* row/col indices so
the bug class cannot exist.

All math is fp32 regardless of input dtype (reference invariant,
src/common/correctness.py:10-12).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def causal_mask(
    q_len: int,
    k_len: int,
    *,
    q_offset: int = 0,
) -> jax.Array:
    """Boolean (q_len, k_len) mask; True = attend.

    Supports q_len != k_len with the KV-cache convention: query row ``i``
    corresponds to absolute position ``i + k_len - q_len + q_offset``
    (reference ``look_ahead_mask_``, src/fa3/torch/flashattention_pytorch.py:176-190).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    offset = k_len - q_len + q_offset
    return cols <= rows + offset


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    bias: jax.Array | None = None,
    mask: jax.Array | None = None,
    q_offset: jax.Array | int | None = None,
    window: int | None = None,
    softcap: float | None = None,
    sinks: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Dense fp32 attention oracle.

    ``softcap``: logit soft-capping (Gemma-2-style; the flash-attn
    ``softcap`` knob) — scores become softcap * tanh(s / softcap) BEFORE
    any mask, bounding |s| < softcap.

    ``window``: sliding-window band under causal — row r attends cols in
    (r + offset - window, r + offset].

    Args:
      q: (..., N_q, D) queries; leading dims are batch/head.
      k, v: (..., N_k, D) keys/values.
      causal: apply the causal mask (absolute-index based; q_len != k_len ok).
      softmax_scale: defaults to D**-0.5 (reference src/fa1/op.py:8-9).
      bias: optional additive bias broadcastable to (..., N_q, N_k).
      mask: optional boolean mask broadcastable to (..., N_q, N_k); True=attend.
      q_offset: absolute key position of query row 0 under causal (row r
        attends cols <= r + q_offset; may be traced). Default n_k - n_q —
        note this is the *absolute* convention of flash_attention, not
        causal_mask's additive-shift q_offset.

    Returns:
      (o, lse): o has q's shape/dtype; lse is fp32 (..., N_q) —
      the reference's (o, lse) contract (src/common/correctness.py:5-21).
    """
    *_, n_q, d = q.shape
    n_k = k.shape[-2]
    if softmax_scale is None:
        softmax_scale = d ** -0.5

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum("...qd,...kd->...qk", qf, kf) * softmax_scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if causal:
        offset = (n_k - n_q) if q_offset is None else q_offset
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_k), 1)
        cm = cols <= rows + offset
        if window is not None:
            band = cols > rows + offset - window
            if sinks:
                band = band | (cols < sinks)  # StreamingLLM sinks
            cm = cm & band
        s = jnp.where(cm, s, DEFAULT_MASK_VALUE)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    o = jnp.einsum("...qk,...kd->...qd", p, vf)
    return o.astype(q.dtype), lse


def reference_attention_grads(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    do: jax.Array,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    window: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Autograd-based oracle gradients (reference ``reference_backward``,
    src/common/correctness.py:24-33): dq, dk, dv of sum(o * do)."""

    def loss(q_, k_, v_):
        o, _ = reference_attention(
            q_, k_, v_, causal=causal, softmax_scale=softmax_scale,
            window=window,
        )
        return jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@functools.partial(jax.jit, static_argnames=("causal", "softmax_scale"))
def _jit_reference(q, k, v, causal=False, softmax_scale=None):
    return reference_attention(q, k, v, causal=causal, softmax_scale=softmax_scale)
