"""Block-sparse Pallas kernel vs. the XLA executor with the expanded
elementwise mask (the reference L6 _block_sparse_flash_attention semantics,
src/fa3/torch/flashattention_pytorch.py:94-174)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.ops.pallas_sparse import pallas_sparse_attention
from flashattention_tpu.ops.reference import (
    reference_attention,
    reference_attention_grads,
)
from flashattention_tpu.ops.tiled import tiled_attention
from flashattention_tpu.utils.testing import LSE_TOL, assert_allclose, make_qkv

BQ = BK = 128


def _expand(pattern, n_q, n_k):
    m = jnp.repeat(jnp.repeat(pattern.astype(bool), BQ, 0), BK, 1)
    return m[:n_q, :n_k]


@pytest.mark.parametrize("causal", [False, True])
def test_sparse_matches_masked_executor(causal):
    b, h, n, d = 1, 2, 512, 64
    q, k, v = make_qkv(b, h, n, d)
    pattern = jnp.asarray(
        [[1, 0, 0, 0], [1, 1, 0, 0], [0, 1, 1, 0], [1, 0, 1, 1]], bool
    )
    o, lse = pallas_sparse_attention(
        q, k, v, pattern, causal=causal, block_q=BQ, block_k=BK
    )
    o_ref, lse_ref = tiled_attention(
        q, k, v, causal=causal, mask=_expand(pattern, n, n), block_k=BK
    )
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_sparse_dense_pattern_matches_oracle():
    b, h, n, d = 1, 2, 384, 64
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_sparse_attention(
        q, k, v, None, causal=True, block_q=BQ, block_k=BK
    )
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_sparse_backward_matches_masked_executor():
    b, h, n, d = 1, 2, 512, 64
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)
    pattern = jnp.asarray(
        [[1, 0, 0, 0], [1, 1, 0, 0], [0, 1, 1, 0], [1, 0, 1, 1]], bool
    )

    def loss(q_, k_, v_):
        o, _ = pallas_sparse_attention(
            q_, k_, v_, pattern, block_q=BQ, block_k=BK
        )
        return jnp.sum(o * do)

    def loss_ref(q_, k_, v_):
        o, _ = tiled_attention(q_, k_, v_, mask=_expand(pattern, n, n), block_k=BK)
        return jnp.sum(o * do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, gr in zip(grads, grads_ref):
        assert_allclose(g, gr, rtol=2e-3, atol=2e-3)


def test_sparse_fully_masked_rows_are_zero():
    b, h, n, d = 1, 1, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    pattern = jnp.asarray([[1, 1], [0, 0]], bool)  # second Q tile sees nothing
    o, lse = pallas_sparse_attention(q, k, v, pattern, block_q=BQ, block_k=BK)
    assert np.abs(np.asarray(o[:, :, BQ:])).max() == 0.0
    assert np.all(np.isneginf(np.asarray(lse[:, :, BQ:])))
    # active rows match the oracle restricted to their tiles
    o_ref, _ = reference_attention(q[:, :, :BQ], k, v)
    assert_allclose(o[:, :, :BQ], o_ref, rtol=1e-4, atol=1e-4)


def test_sparse_unaligned_seq_padding():
    b, h, n, d = 1, 1, 200, 64  # pads to 256 -> 2x2 tiles
    q, k, v = make_qkv(b, h, n, d)
    pattern = jnp.ones((2, 2), bool)
    o, lse = pallas_sparse_attention(
        q, k, v, pattern, causal=True, block_q=BQ, block_k=BK
    )
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_sparse_gqa_forward_and_backward():
    """GQA: H query heads share H_kv KV heads via grouped index maps (no
    head repetition in HBM)."""
    b, h_q, h_kv, n, d = 1, 4, 2, 256, 64
    groups = h_q // h_kv
    q, _, _ = make_qkv(b, h_q, n, d)
    _, k, v = make_qkv(b, h_kv, n, d, seed=5)
    pattern = jnp.asarray([[1, 0], [1, 1]], bool)
    o, lse = pallas_sparse_attention(
        q, k, v, pattern, causal=True, block_q=BQ, block_k=BK
    )
    k_rep = jnp.repeat(k, groups, axis=1)
    v_rep = jnp.repeat(v, groups, axis=1)
    o_ref, lse_ref = tiled_attention(
        q, k_rep, v_rep, causal=True, mask=_expand(pattern, n, n), block_k=BK
    )
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)

    do = jax.random.normal(jax.random.key(7), (b, h_q, n, d), jnp.float32)

    def loss(q_, k_, v_):
        o2, _ = pallas_sparse_attention(
            q_, k_, v_, pattern, causal=True, block_q=BQ, block_k=BK
        )
        return jnp.sum(o2 * do)

    def loss_ref(q_, k_, v_):
        o2, _ = tiled_attention(
            q_, jnp.repeat(k_, groups, axis=1), jnp.repeat(v_, groups, axis=1),
            causal=True, mask=_expand(pattern, n, n), block_k=BK,
        )
        return jnp.sum(o2 * do)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g, gr):
        assert a.shape == bb.shape
        assert_allclose(a, bb, rtol=2e-3, atol=2e-3)
