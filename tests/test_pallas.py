"""Pallas kernel vs. oracle — the reference's archetype-3/-4 tests
(triton-forward vs oracle, cuda-backward end-to-end; tests/
test_correctness_fa1.py:56-110). Off-TPU these run the same kernels in
Pallas interpreter mode instead of skipping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.reference import (
    reference_attention,
    reference_attention_grads,
)
from flashattention_tpu.utils.testing import (
    LSE_TOL,
    assert_allclose,
    dtype_tolerances,
    make_qkv,
)

# Small tiles so multi-tile paths are exercised at test sizes.
BQ, BK = 128, 128

SHAPES = [
    (1, 2, 128, 64),
    (2, 1, 256, 64),
    (1, 2, 384, 128),
    (1, 1, 200, 64),   # unaligned seq -> padding path
]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_forward_vs_oracle(shape, causal, dtype):
    b, h, n, d = shape
    q, k, v = make_qkv(b, h, n, d, dtype=dtype)
    o, lse = pallas_attention(
        q, k, v, causal=causal, block_q=BQ, block_k=BK
    )
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    rtol, atol = dtype_tolerances(dtype)
    assert o.dtype == q.dtype  # reference quirk Q2 (forced fp16 store) fixed
    assert_allclose(o, o_ref, rtol=rtol, atol=atol)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


@pytest.mark.parametrize("shape", [(1, 2, 256, 64), (1, 1, 200, 64)])
@pytest.mark.parametrize("causal", [False, True])
def test_pallas_backward_vs_oracle(shape, causal):
    b, h, n, d = shape
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)

    def loss(q_, k_, v_):
        o, _ = pallas_attention(q_, k_, v_, causal=causal, block_q=BQ, block_k=BK)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do, causal=causal)
    assert_allclose(dq, dq_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dk, dk_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dv, dv_r, rtol=2e-3, atol=2e-3)


def test_pallas_decode_qlen_ne_klen():
    q, k, v = make_qkv(1, 2, 128, 64, kv_seq=384)
    o, lse = pallas_attention(q, k, v, causal=True, block_q=BQ, block_k=BK)
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_pallas_jit_composes():
    q, k, v = make_qkv(1, 2, 256, 64, dtype=jnp.bfloat16)

    @jax.jit
    def f(q, k, v):
        o, lse = pallas_attention(q, k, v, causal=True, block_q=BQ, block_k=BK)
        return o, lse

    o, lse = f(q, k, v)
    o_ref, _ = reference_attention(q, k, v, causal=True)
    assert_allclose(o, o_ref, rtol=5e-2, atol=5e-2)
