"""Fused FP8 (FA3) Pallas kernel tests: vs. the exact oracle at the relaxed
fp8 tolerance and vs. a same-partitioning quantized-input oracle tightly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu import fa3_attention
from flashattention_tpu.ops.pallas_fp8 import (
    _dequant,
    pallas_fp8_attention,
    quantize_tiles,
)
from flashattention_tpu.ops.reference import reference_attention
from flashattention_tpu.utils.testing import (
    FP8_O_TOL,
    LSE_TOL,
    assert_allclose,
    make_qkv,
)

BQ, BK = 128, 128


def _quantized_oracle(q, k, v, bq, bk, causal):
    """Dense oracle on the exact same quantized values the kernel consumes."""
    q8, sq = quantize_tiles(q, bq)
    k8, sk = quantize_tiles(k, bk)
    v8, sv = quantize_tiles(v, bk)
    return reference_attention(
        _dequant(q8, sq, bq).astype(q.dtype),
        _dequant(k8, sk, bk).astype(q.dtype),
        _dequant(v8, sv, bk).astype(q.dtype),
        causal=causal,
    )


@pytest.mark.parametrize("shape", [(1, 2, 256, 64), (2, 1, 384, 128)])
@pytest.mark.parametrize("causal", [False, True])
def test_fp8_kernel_vs_quantized_oracle(shape, causal):
    b, h, n, d = shape
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_fp8_attention(q, k, v, causal=causal, block_q=BQ, block_k=BK)
    o_qref, lse_qref = _quantized_oracle(q, k, v, BQ, BK, causal)
    assert_allclose(o, o_qref, rtol=5e-3, atol=5e-3)
    assert_allclose(lse, lse_qref, rtol=LSE_TOL, atol=LSE_TOL)
    # and within the relaxed tolerance of the exact oracle
    o_ref, _ = reference_attention(q, k, v, causal=causal)
    assert_allclose(o, o_ref, rtol=FP8_O_TOL, atol=FP8_O_TOL)


def test_fp8_kernel_unaligned_seq():
    q, k, v = make_qkv(1, 2, 200, 64)
    o, _ = pallas_fp8_attention(q, k, v, causal=True, block_q=BQ, block_k=BK)
    o_ref, _ = reference_attention(q, k, v, causal=True)
    assert_allclose(o, o_ref, rtol=FP8_O_TOL, atol=FP8_O_TOL)


def test_fp8_backward_ste():
    q, k, v = make_qkv(1, 2, 256, 64)
    do = jax.random.normal(jax.random.key(7), q.shape)

    def loss(q_, k_, v_):
        o, _ = pallas_fp8_attention(q_, k_, v_, block_q=BQ, block_k=BK)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert g.shape == q.shape
        assert np.isfinite(np.asarray(g, np.float32)).all()
    # STE grads track the exact grads to fp8 tolerance
    from flashattention_tpu.ops.reference import reference_attention_grads

    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do)
    assert_allclose(dq, dq_r, rtol=FP8_O_TOL, atol=2 * FP8_O_TOL)
    assert_allclose(dv, dv_r, rtol=FP8_O_TOL, atol=2 * FP8_O_TOL)


def test_fa3_fp8_dispatches_fused_kernel_on_pallas():
    q, k, v = make_qkv(1, 2, 256, 64)
    o, lse = fa3_attention(q, k, v, fp8=True, backend="pallas")
    o_ref, _ = reference_attention(q, k, v)
    assert o.shape == q.shape
    assert_allclose(o, o_ref, rtol=FP8_O_TOL, atol=FP8_O_TOL)
