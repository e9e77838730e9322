"""Block quantization + incoherent processing for the FP8 (FA3) path.

TPU-native re-design of the reference's fp16 "fake quant" helpers
(src/common/utils.py:23-74, duplicated at src/fa3/torch/impl.py:20-72):

- Real ``float8_e4m3fn`` payloads with per-(batch*head, seq-block) fp32
  scales, instead of the reference's clamp-to-[-1,1] fp16 stand-in
  (utils.py:35-46).
- A *correct* Walsh–Hadamard transform. The reference's Python
  ``hadamard_inplace`` aliases views (writes ``a+c`` before reading ``a`` for
  ``a-c``) and is not a Hadamard transform at all — verified bug B5
  (SURVEY.md §2.6). The C++ variant (csrc/fa3/fa3_fwd.cu:32-44) is correct;
  this module matches the C++ semantics with the Python path's seeded-random
  sign convention (utils.py:63-67) — resolving reference quirk Q8 in favor of
  the randomized transform the FA3 paper describes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # float8_e4m3fn max normal
FP8_DTYPE = jnp.float8_e4m3fn
SCALE_EPS = 1e-6  # reference clamp_min eps (src/common/utils.py:32)


def hadamard_transform(x: jax.Array, *, normalize: bool = True) -> jax.Array:
    """Fast Walsh–Hadamard transform along the last axis.

    Requires the last dim to be a power of two (the reference no-ops
    otherwise, utils.py:62; callers here check explicitly). With
    ``normalize``, divides by sqrt(d) so the transform is orthonormal
    (H @ H.T = I) and attention scores are preserved when applied to both
    q and k.
    """
    d = x.shape[-1]
    if d & (d - 1):
        raise ValueError(f"Hadamard requires power-of-2 dim, got {d}")
    orig_shape = x.shape
    xf = x.astype(jnp.float32).reshape(-1, d)
    h = 1
    while h < d:
        xf = xf.reshape(-1, d // (2 * h), 2, h)
        a = xf[:, :, 0, :]
        c = xf[:, :, 1, :]
        xf = jnp.stack([a + c, a - c], axis=2)
        h *= 2
    xf = xf.reshape(orig_shape)
    if normalize:
        xf = xf / jnp.sqrt(jnp.float32(d))
    return xf.astype(x.dtype)


def incoherent_process(
    q: jax.Array, k: jax.Array, *, seed: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Randomized-Hadamard rotation of q and k (QuaRot/FA3-style).

    q' = (q * s) H / sqrt(d), k' = (k * s) H / sqrt(d) with a shared random
    ±1 diagonal s, so q'k'^T == q H Hᵀ kᵀ / d ... == qkᵀ / d? No: with the
    orthonormal convention (normalize=True) the rotation is orthogonal, so
    q'k'^T == qk^T exactly — scores are preserved while per-element outliers
    are spread out, which is the whole point before 8-bit quantization.

    No-op (returns inputs) when head_dim is not a power of two — the
    reference's gate (utils.py:62).
    """
    d = q.shape[-1]
    if d & (d - 1):
        return q, k
    key = jax.random.key(seed)
    sign = jax.random.rademacher(key, (d,), dtype=jnp.float32)
    qr = hadamard_transform(q.astype(jnp.float32) * sign, normalize=True)
    kr = hadamard_transform(k.astype(jnp.float32) * sign, normalize=True)
    return qr.astype(q.dtype), kr.astype(k.dtype)


def block_absmax_scale(x: jax.Array, block: int, *, amax: float = FP8_MAX):
    """Per-(..., seq-block) fp32 scales: absmax / amax, clamped to eps.

    x: (..., N, D) with N divisible by ``block`` (pad first).
    Returns scales of shape (..., N // block).
    (Reference block_absmax_scale, src/common/utils.py:23-33, generalized
    from fp16 fake-quant to real fp8 ranges.)
    """
    *lead, n, d = x.shape
    xb = x.astype(jnp.float32).reshape(*lead, n // block, block, d)
    absmax = jnp.max(jnp.abs(xb), axis=(-2, -1))
    return jnp.maximum(absmax / amax, SCALE_EPS)


def quantize_fp8_blocks(x: jax.Array, block: int):
    """Quantize (..., N, D) to float8_e4m3fn with per-seq-block scales.

    Returns (payload fp8, scales fp32 (..., N//block)).
    """
    *lead, n, d = x.shape
    scales = block_absmax_scale(x, block)
    xb = x.astype(jnp.float32).reshape(*lead, n // block, block, d)
    q = xb / scales[..., None, None]
    q = jnp.clip(q, -FP8_MAX, FP8_MAX).astype(FP8_DTYPE)
    return q.reshape(*lead, n, d), scales


def dequantize_fp8_blocks(payload: jax.Array, scales: jax.Array, block: int):
    *lead, n, d = payload.shape
    xb = payload.astype(jnp.float32).reshape(*lead, n // block, block, d)
    return (xb * scales[..., None, None]).reshape(*lead, n, d)


INT8_MAX = 127.0
E5M2_MAX = 57344.0  # float8_e5m2 max normal
E5M2_DTYPE = jnp.float8_e5m2


def quantize_e5m2_blocks(x: jax.Array, block: int):
    """Quantize (..., N, D) to float8_e5m2 with per-seq-block fp32 scales.

    e5m2 trades one mantissa bit of e4m3 for 2^5 more exponent range —
    the better payload when a block mixes magnitudes (outliers cost e4m3
    whole blocks of resolution via the shared absmax scale). The decode
    chain is shift-only (pallas_paged._fp8_e5m2_to_bf16_bits), cheaper than
    e4m3's. SURVEY §2.2 N4 names e4m3/e5m2 as the FA3 TPU payload plan.
    """
    *lead, n, d = x.shape
    scales = block_absmax_scale(x, block, amax=E5M2_MAX)
    xb = x.astype(jnp.float32).reshape(*lead, n // block, block, d)
    q = jnp.clip(xb / scales[..., None, None], -E5M2_MAX, E5M2_MAX)
    return q.astype(E5M2_DTYPE).reshape(*lead, n, d), scales


def quantize_int8_blocks(x: jax.Array, block: int):
    """Quantize (..., N, D) to int8 with per-seq-block fp32 scales.

    The TPU-native payload format: v5e's MXU is int8-native (s8xs8->s32 at
    2x bf16 peak), so int8 payloads need NO in-kernel convert chain at all
    — unlike e4m3, whose 8-14-op bit-surgery decode is the measured
    bottleneck of the fp8 paths (RESULTS.md round 3). Extension beyond the
    reference (whose fp8 targets H100 tensor cores, src/fa3/torch/impl.py);
    dequantize via dequantize_fp8_blocks (payload-dtype generic).

    Returns (payload int8, scales fp32 (..., N//block)).
    """
    *lead, n, d = x.shape
    scales = block_absmax_scale(x, block, amax=INT8_MAX)
    xb = x.astype(jnp.float32).reshape(*lead, n // block, block, d)
    q = jnp.clip(jnp.round(xb / scales[..., None, None]), -127.0, 127.0)
    return q.astype(jnp.int8).reshape(*lead, n, d), scales


@functools.partial(jax.jit, static_argnames=("block",))
def fake_quant_fp8(x: jax.Array, block: int) -> jax.Array:
    """Quant→dequant round trip (the parity-testing analogue of the
    reference's block_quant_dequant, utils.py:35-46, at real fp8 precision)."""
    payload, scales = quantize_fp8_blocks(x, block)
    return dequantize_fp8_blocks(payload, scales, block).astype(x.dtype)
