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


# ---------------------------------------------------------------------------
# GQA (grouped-query attention): H query heads share H_kv < H KV heads.
# Oracle = reference attention with k/v head-repeated (identical semantics).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h_q,h_kv", [(4, 2), (4, 1), (2, 2)])
@pytest.mark.parametrize("causal", [False, True])
def test_pallas_gqa_forward(h_q, h_kv, causal):
    b, n, d = 1, 256, 64
    q, _, _ = make_qkv(b, h_q, n, d)
    _, k, v = make_qkv(b, h_kv, n, d, seed=5)
    o, lse = pallas_attention(q, k, v, causal=causal, block_q=BQ, block_k=BK)
    groups = h_q // h_kv
    # repeat(k, groups) puts kv head g's copies at query heads
    # [g*groups, (g+1)*groups) — the same grouping the kernel's h // groups
    # index map uses, so outputs compare head-for-head.
    o_ref, lse_ref = reference_attention(
        q, jnp.repeat(k, groups, axis=1), jnp.repeat(v, groups, axis=1),
        causal=causal,
    )
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_pallas_gqa_backward():
    b, h_q, h_kv, n, d = 1, 4, 2, 256, 64
    groups = h_q // h_kv
    q, _, _ = make_qkv(b, h_q, n, d)
    _, k, v = make_qkv(b, h_kv, n, d, seed=5)
    do = jax.random.normal(jax.random.key(7), (b, h_q, n, d), dtype=jnp.float32)

    def loss(q_, k_, v_):
        o, _ = pallas_attention(q_, k_, v_, causal=True, block_q=BQ, block_k=BK)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert dk.shape == k.shape and dv.shape == v.shape

    def loss_ref(q_, k_, v_):
        o, _ = reference_attention(
            q_, jnp.repeat(k_, groups, axis=1), jnp.repeat(v_, groups, axis=1),
            causal=True,
        )
        return jnp.sum(o * do)

    dq_r, dk_r, dv_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    assert_allclose(dq, dq_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dk, dk_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dv, dv_r, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Dropout: counter-based keep mask, regenerated in the backward.
# The dense replica below reimplements the kernel's murmur3 stream, so the
# oracle sees the *same* mask — fwd and bwd compare exactly, not statistically.
# ---------------------------------------------------------------------------


def _keep_dense(seed, b, h, n_q, n_k_pad, rate):
    """Dense replica of pallas_attn._keep_mask over the whole (N_q, N_k)."""
    rows = jnp.arange(n_q, dtype=jnp.int32)[:, None].astype(jnp.uint32)
    cols = jnp.arange(n_k_pad, dtype=jnp.int32)[None, :].astype(jnp.uint32)
    outs = []
    for ib in range(b):
        row = []
        for ih in range(h):
            bh = jnp.uint32(ib * h + ih)
            x = (
                rows * jnp.uint32(0x9E3779B1)
                + cols * jnp.uint32(0x85EBCA77)
                + jnp.uint32(seed)
                + bh * jnp.uint32(2654435761)
            )
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
            row.append(x >= jnp.uint32(min(int(rate * 2**32), 2**32 - 1)))
        outs.append(jnp.stack(row))
    return jnp.stack(outs)  # (B, H, N_q, N_k)


def _dense_dropout_attention(q, k, v, keep, rate, causal=False):
    from flashattention_tpu.ops.reference import DEFAULT_MASK_VALUE, causal_mask

    d = q.shape[-1]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (d ** -0.5)
    if causal:
        s = jnp.where(causal_mask(q.shape[-2], k.shape[-2]), s, DEFAULT_MASK_VALUE)
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    p_v = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p_v, v.astype(jnp.float32))


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_dropout_matches_dense_replica(causal):
    b, h, n, d, rate, seed = 1, 2, 256, 64, 0.2, 1234
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_attention(
        q, k, v, causal=causal, block_q=BQ, block_k=BK,
        dropout_rate=rate, dropout_seed=seed,
    )
    keep = _keep_dense(seed, b, h, n, n, rate)
    o_ref = _dense_dropout_attention(q, k, v, keep, rate, causal=causal)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    # LSE is a softmax statistic — dropout must not change it.
    _, lse_nodrop = reference_attention(q, k, v, causal=causal)
    assert_allclose(lse, lse_nodrop, rtol=LSE_TOL, atol=LSE_TOL)


def test_pallas_dropout_backward_matches_dense_replica():
    b, h, n, d, rate, seed = 1, 2, 256, 64, 0.15, 99
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)
    keep = _keep_dense(seed, b, h, n, n, rate)

    def loss(q_, k_, v_):
        o, _ = pallas_attention(
            q_, k_, v_, block_q=BQ, block_k=BK,
            dropout_rate=rate, dropout_seed=seed,
        )
        return jnp.sum(o * do)

    def loss_ref(q_, k_, v_):
        o = _dense_dropout_attention(q_, k_, v_, keep, rate)
        return jnp.sum(o * do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, gr in zip(grads, grads_ref):
        assert_allclose(g, gr, rtol=2e-3, atol=2e-3)


def test_pallas_dropout_zero_rate_is_identity():
    q, k, v = make_qkv(1, 2, 256, 64)
    o0, _ = pallas_attention(q, k, v, block_q=BQ, block_k=BK)
    o1, _ = pallas_attention(
        q, k, v, block_q=BQ, block_k=BK, dropout_rate=0.0, dropout_seed=3
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_pallas_dropout_seed_sensitivity():
    q, k, v = make_qkv(1, 2, 256, 64)
    o_a, _ = pallas_attention(
        q, k, v, block_q=BQ, block_k=BK, dropout_rate=0.3, dropout_seed=1
    )
    o_a2, _ = pallas_attention(
        q, k, v, block_q=BQ, block_k=BK, dropout_rate=0.3, dropout_seed=1
    )
    o_b, _ = pallas_attention(
        q, k, v, block_q=BQ, block_k=BK, dropout_rate=0.3, dropout_seed=2
    )
    np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_a2))
    assert np.abs(np.asarray(o_a) - np.asarray(o_b)).max() > 0


@pytest.mark.parametrize("impl", ["split", "fused"])
def test_pallas_backward_impls_match_oracle(impl, monkeypatch):
    """Both backward strategies (split dKV/dQ kernels; fused with dQ
    partials) must produce oracle-level gradients."""
    monkeypatch.setenv("FAT_BWD_IMPL", impl)
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)

    def loss(q_, k_, v_):
        o, _ = pallas_attention(q_, k_, v_, causal=True, block_q=BQ, block_k=BK)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do, causal=True)
    assert_allclose(dq, dq_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dk, dk_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dv, dv_r, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("window", [37, 128, 300])
def test_sliding_window_matches_oracle(window):
    """Sliding-window (local) attention: fwd o/lse and all grads must match
    the banded dense oracle — exercises tiles skipped below the band, tiles
    masked at both band edges, and full-band interior tiles."""
    b, h, n, d = 1, 2, 384, 64
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_attention(
        q, k, v, causal=True, window=window, block_q=128, block_k=128
    )
    o_ref, lse_ref = reference_attention(q, k, v, causal=True, window=window)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)

    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)

    def loss(q_, k_, v_):
        o2, _ = pallas_attention(
            q_, k_, v_, causal=True, window=window, block_q=128, block_k=128
        )
        return jnp.sum(o2 * do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = reference_attention_grads(
        q, k, v, do, causal=True, window=window
    )
    for g, gr in zip(grads, grads_ref):
        assert_allclose(g, gr, rtol=2e-3, atol=2e-3)


def test_sliding_window_degenerates_to_causal():
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    o_w, lse_w = pallas_attention(
        q, k, v, causal=True, window=n, block_q=BQ, block_k=BK
    )
    o_c, lse_c = pallas_attention(
        q, k, v, causal=True, block_q=BQ, block_k=BK
    )
    assert_allclose(o_w, o_c, rtol=1e-6, atol=1e-6)
    assert_allclose(lse_w, lse_c, rtol=1e-6, atol=1e-6)


def test_sliding_window_decode_offset():
    """q_len < k_len (KV-cache decode shape): the band follows the absolute
    offset, matching the oracle's bottom-aligned convention."""
    b, h, n_q, n_k, d = 1, 2, 64, 320, 64
    q, _, _ = make_qkv(b, h, n_q, d)
    _, k, v = make_qkv(b, h, n_k, d)
    o, lse = pallas_attention(
        q, k, v, causal=True, window=100, block_q=64, block_k=128
    )
    o_ref, lse_ref = reference_attention(q, k, v, causal=True, window=100)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_sliding_window_api_backends_agree():
    """flash_attention(window=...) gives identical math on the pallas and
    xla backends (the xla route folds the band into an elementwise mask)."""
    from flashattention_tpu.ops.api import flash_attention

    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    o_p, lse_p = flash_attention(
        q, k, v, causal=True, window=70, backend="pallas",
        block_q=128, block_k=128,
    )
    o_x, lse_x = flash_attention(q, k, v, causal=True, window=70, backend="xla")
    o_r, lse_r = flash_attention(
        q, k, v, causal=True, window=70, backend="reference"
    )
    assert_allclose(o_p, o_x, rtol=1e-5, atol=1e-5)
    assert_allclose(o_p, o_r, rtol=1e-5, atol=1e-5)
    assert_allclose(lse_p, lse_x, rtol=1e-5, atol=1e-5)
    assert_allclose(lse_p, lse_r, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="causal"):
        flash_attention(q, k, v, window=70)


def test_pallas_bwd_blocks_differ_from_fwd():
    """Per-direction tiling (specs pair a large fwd block with a smaller
    bwd block where the big backward hangs Mosaic) must not change the
    math: grads with bwd_block_* != block_* match the oracle and the
    same-blocks grads exactly at fp32."""
    b, h, n, d = 1, 2, 384, 64
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)

    def loss(bwd_bq, bwd_bk):
        def f(q_, k_, v_):
            o, _ = pallas_attention(
                q_, k_, v_, causal=True, block_q=256, block_k=256,
                bwd_block_q=bwd_bq, bwd_block_k=bwd_bk,
            )
            return jnp.sum(o * do)
        return f

    grads = jax.grad(loss(128, 128), argnums=(0, 1, 2))(q, k, v)
    grads_same = jax.grad(loss(None, None), argnums=(0, 1, 2))(q, k, v)
    grads_ref = reference_attention_grads(q, k, v, do, causal=True)
    for g, gs, gr in zip(grads, grads_same, grads_ref):
        assert_allclose(g, gr, rtol=2e-3, atol=2e-3)
        assert_allclose(g, gs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d", [40, 48])
def test_pallas_odd_head_dims(d):
    """Non-power-of-2 head dims (reference exercises d=40/48,
    tests/test_correctness_fa2.py:40,92) — pads to the lane width."""
    b, h, n = 1, 2, 256
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_attention(q, k, v, causal=True, block_q=BQ, block_k=BK)
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert o.shape == q.shape
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)

    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)

    def loss(q_, k_, v_):
        o2, _ = pallas_attention(q_, k_, v_, block_q=BQ, block_k=BK)
        return jnp.sum(o2 * do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = reference_attention_grads(q, k, v, do)
    for g, gr in zip(grads, grads_ref):
        assert_allclose(g, gr, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_pallas_causal_rows_with_no_valid_keys():
    """n_q > n_k causal: leading query rows attend to nothing and must emit
    exactly 0 with zero gradient contribution (previously they produced a
    uniform average of V and corrupted dK/dV)."""
    b, h, n_q, n_k, d = 1, 1, 16, 8, 64
    q, _, _ = make_qkv(b, h, n_q, d)
    _, k, v = make_qkv(b, h, n_k, d, seed=3)
    o, lse = pallas_attention(q, k, v, causal=True, block_q=BQ, block_k=BK)
    offset = n_k - n_q  # row r attends to cols <= r + offset
    dead_rows = max(0, min(n_q, -offset))
    assert np.abs(np.asarray(o[:, :, :dead_rows])).max() == 0.0
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    # live rows still match the oracle
    assert_allclose(o[:, :, dead_rows:], o_ref[:, :, dead_rows:],
                    rtol=1e-4, atol=1e-4)
    do = jax.random.normal(jax.random.key(7), (b, h, n_q, d), jnp.float32)

    def loss(q_, k_, v_):
        o2, _ = pallas_attention(q_, k_, v_, causal=True, block_q=BQ, block_k=BK)
        return jnp.sum(o2[:, :, dead_rows:] * do[:, :, dead_rows:])

    def loss_ref(q_, k_, v_):
        o2, _ = reference_attention(q_, k_, v_, causal=True)
        return jnp.sum(o2[:, :, dead_rows:] * do[:, :, dead_rows:])

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g, gr):
        assert_allclose(a, bb, rtol=2e-3, atol=2e-3)


def test_lse_cotangent_flows():
    """Losses that read the returned LSE must get real gradients (the LSE
    cotangent folds into di: ds = p * (dp - (di - dlse)))."""
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)

    def loss(q_, k_, v_):
        _, lse = pallas_attention(q_, k_, v_, block_q=BQ, block_k=BK)
        return jnp.sum(lse ** 2)

    def loss_ref(q_, k_, v_):
        _, lse = reference_attention(q_, k_, v_)
        return jnp.sum(lse ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    assert np.abs(np.asarray(g[0])).max() > 0  # not silently zero
    for a, bb in zip(g, gr):
        assert_allclose(a, bb, rtol=2e-3, atol=2e-3)

    # mixed loss: both o and lse contribute
    def loss2(q_, k_, v_):
        o, lse = pallas_attention(q_, k_, v_, causal=True, block_q=BQ, block_k=BK)
        return jnp.sum(o ** 2) + jnp.sum(lse)

    def loss2_ref(q_, k_, v_):
        o, lse = reference_attention(q_, k_, v_, causal=True)
        return jnp.sum(o ** 2) + jnp.sum(lse)

    g2 = jax.grad(loss2, argnums=(0, 1, 2))(q, k, v)
    g2r = jax.grad(loss2_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g2, g2r):
        assert_allclose(a, bb, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("q_offset", [-64, 0, 37, 128])
def test_q_offset_forward_and_grads(q_offset):
    """Explicit q_offset (the CP-shard diagonal convention: row r attends
    cols <= r + q_offset) vs the oracle with the same offset, fwd + grads.
    Covers negative offsets (rows with zero keys -> o = 0, dead grads)."""
    b, h, n_q, n_k, d = 1, 2, 128, 128, 64
    q, _, _ = make_qkv(b, h, n_q, d)
    _, k, v = make_qkv(b, h, n_k, d, seed=3)
    o, lse = pallas_attention(
        q, k, v, causal=True, q_offset=q_offset, block_q=BQ, block_k=BK
    )
    o_ref, lse_ref = reference_attention(q, k, v, causal=True, q_offset=q_offset)
    dead = max(0, min(n_q, -q_offset))  # rows attending nothing
    if dead:
        assert np.abs(np.asarray(o[:, :, :dead], np.float32)).max() == 0.0
    assert_allclose(o[:, :, dead:], o_ref[:, :, dead:], rtol=1e-4, atol=1e-4)
    assert_allclose(
        lse[:, :, dead:], lse_ref[:, :, dead:], rtol=1e-3, atol=1e-3
    )

    do = jax.random.normal(jax.random.key(5), q.shape, jnp.float32)

    def loss(fn):
        def f(q_, k_, v_):
            o2, _ = fn(q_, k_, v_)
            return jnp.sum(o2[:, :, dead:] * do[:, :, dead:])
        return f

    g = jax.grad(
        loss(lambda *a: pallas_attention(
            *a, causal=True, q_offset=q_offset, block_q=BQ, block_k=BK
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        loss(lambda *a: reference_attention(*a, causal=True, q_offset=q_offset)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, bb in zip(g, gr):
        assert_allclose(a, bb, rtol=2e-3, atol=2e-3)


def test_q_offset_traced():
    """q_offset as a traced scalar (the all-gather CP path) under jit."""
    q, k, v = make_qkv(1, 2, 128, 64)

    @jax.jit
    def run(off):
        return pallas_attention(
            q, k, v, causal=True, q_offset=off, block_q=BQ, block_k=BK
        )[0]

    for off in (0, 64):
        o = run(jnp.int32(off))
        o_ref, _ = reference_attention(q, k, v, causal=True, q_offset=off)
        assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Segment-ids (packed varlen) attention
# ---------------------------------------------------------------------------


def _rand_segments(rng, b, n, max_segs=4):
    """Random contiguous segment ids (B, N), ids >= 0, uneven lengths."""
    ids = np.zeros((b, n), np.int32)
    for i in range(b):
        cuts = np.sort(rng.choice(np.arange(1, n), size=max_segs - 1,
                                  replace=False))
        for s, start in enumerate(np.concatenate([[0], cuts])):
            ids[i, start:] = s
    return ids


def _seg_mask(q_ids, kv_ids):
    return q_ids[:, None, :, None] == kv_ids[:, None, None, :]


@pytest.mark.parametrize("causal", [False, True])
def test_segment_ids_match_masked_oracle(causal):
    """Packed varlen via segment ids (flash-attn's cu_seqlens capability —
    new scope, the reference has no varlen API): o/lse must equal the dense
    oracle under the equivalent block-diagonal mask, including padding of
    an unaligned sequence length."""
    b, h, n, d = 2, 2, 200, 64  # n % BQ != 0: exercises seg-id padding
    q, k, v = make_qkv(b, h, n, d)
    ids = jnp.asarray(_rand_segments(np.random.default_rng(3), b, n))
    o, lse = pallas_attention(
        q, k, v, causal=causal, block_q=BQ, block_k=BK, segment_ids=ids
    )
    o_r, lse_r = reference_attention(
        q, k, v, causal=causal, mask=_seg_mask(ids, ids)
    )
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)


def test_segment_ids_packing_equivalence():
    """THE varlen semantic: two sequences packed into one row with segment
    ids compute exactly what two separate attention calls compute."""
    h, d = 2, 64
    n1, n2 = 160, 96
    q, k, v = make_qkv(1, h, n1 + n2, d, seed=11)
    ids = jnp.asarray(
        np.concatenate([np.zeros(n1, np.int32), np.ones(n2, np.int32)])
    )[None, :]
    o_packed, _ = pallas_attention(
        q, k, v, causal=True, block_q=BQ, block_k=BK, segment_ids=ids
    )
    o_1, _ = pallas_attention(
        q[:, :, :n1], k[:, :, :n1], v[:, :, :n1], causal=True,
        block_q=BQ, block_k=BK,
    )
    o_2, _ = pallas_attention(
        q[:, :, n1:], k[:, :, n1:], v[:, :, n1:], causal=True,
        block_q=BQ, block_k=BK,
    )
    assert_allclose(o_packed[:, :, :n1], o_1, rtol=1e-5, atol=1e-5)
    assert_allclose(o_packed[:, :, n1:], o_2, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["split", "fused"])
def test_segment_ids_grads(impl, monkeypatch):
    """Segment-masked gradients through BOTH backward strategies must match
    the dense oracle with the equivalent mask."""
    monkeypatch.setenv("FAT_BWD_IMPL", impl)
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    ids = jnp.asarray(_rand_segments(np.random.default_rng(5), b, n))
    do = jax.random.normal(jax.random.key(9), q.shape, dtype=jnp.float32)

    def loss(fn):
        def f(q_, k_, v_):
            o, _ = fn(q_, k_, v_)
            return jnp.sum(o * do)
        return f

    g = jax.grad(
        loss(lambda *a: pallas_attention(
            *a, causal=True, block_q=BQ, block_k=BK, segment_ids=ids
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        loss(lambda *a: reference_attention(
            *a, causal=True, mask=_seg_mask(ids, ids)
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    for got, want in zip(g, gr):
        assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_segment_ids_gqa_and_pair():
    """Segments compose with GQA (per-batch ids shared across the head
    group) and with a (q_ids, kv_ids) pair for q_len != k_len."""
    b, h_q, h_kv, n, d = 1, 4, 2, 256, 64
    q, _, _ = make_qkv(b, h_q, n, d)
    _, k, v = make_qkv(b, h_kv, n, d, seed=2)
    ids = jnp.asarray(_rand_segments(np.random.default_rng(1), b, n))
    o, _ = pallas_attention(
        q, k, v, block_q=BQ, block_k=BK, segment_ids=ids
    )
    kr = jnp.repeat(k, h_q // h_kv, axis=1)
    vr = jnp.repeat(v, h_q // h_kv, axis=1)
    o_r, _ = reference_attention(q, kr, vr, mask=_seg_mask(ids, ids))
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)

    # (q_ids, kv_ids) pair: the last 64 queries against the full kv row.
    o_pair, _ = pallas_attention(
        q[:, :, -64:], k, v, block_q=BQ, block_k=BK,
        segment_ids=(ids[:, -64:], ids),
    )
    o_pr, _ = reference_attention(
        q[:, :, -64:], kr, vr, mask=_seg_mask(ids[:, -64:], ids)
    )
    assert_allclose(o_pair, o_pr, rtol=1e-4, atol=1e-4)


def test_segment_ids_validation():
    q, k, v = make_qkv(1, 2, 128, 64)
    with pytest.raises(ValueError, match="B, N"):
        pallas_attention(q, k, v, segment_ids=jnp.zeros((1, 64), jnp.int32))
    with pytest.raises(ValueError, match="pair"):
        pallas_attention(
            q, k[:, :, :64], v[:, :, :64],
            segment_ids=jnp.zeros((1, 128), jnp.int32),
        )


# ---------------------------------------------------------------------------
# Logit soft-capping
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_softcap_matches_oracle(causal):
    """softcap * tanh(s / softcap) before masking — o and lse must match
    the dense oracle; scores are large (scale 4x) so the cap really bends
    them (tanh far from identity)."""
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    q = q * 4.0  # push |s| well past the cap
    cap = 10.0
    o, lse = pallas_attention(
        q, k, v, causal=causal, block_q=BQ, block_k=BK, softcap=cap
    )
    o_r, lse_r = reference_attention(q, k, v, causal=causal, softcap=cap)
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)
    # the cap must actually matter at this scale
    o_nc, _ = reference_attention(q, k, v, causal=causal)
    assert np.abs(np.asarray(o_nc, np.float32)
                  - np.asarray(o_r, np.float32)).max() > 1e-2


@pytest.mark.slow
def test_softcap_grads_match_oracle():
    """Backward chains through the cap exactly: ds *= 1 - tanh^2 on the
    dq/dk path, dv untouched. Oracle grads come from jax.grad through the
    differentiable dense reference."""
    b, h, n, d = 1, 2, 192, 64
    q, k, v = make_qkv(b, h, n, d)
    q = q * 3.0
    cap = 8.0

    def loss_p(t):
        o, _ = pallas_attention(
            t[0], t[1], t[2], causal=True, block_q=BQ, block_k=BK,
            softcap=cap,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_r(t):
        o, _ = reference_attention(t[0], t[1], t[2], causal=True, softcap=cap)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_p)((q, k, v))
    gr = jax.grad(loss_r)((q, k, v))
    for name, a, bb in zip("dq dk dv".split(), gp, gr):
        assert_allclose(a, bb, rtol=5e-3, atol=5e-3)


def test_softcap_with_window_and_segments():
    """softcap composes with sliding window and segment ids (cap applies
    to raw scores BEFORE every mask)."""
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    cap, win = 12.0, 96
    ids = np.zeros((b, n), np.int32)
    ids[0, 130:] = 1
    ids = jnp.asarray(ids)
    o, lse = pallas_attention(
        q, k, v, causal=True, block_q=BQ, block_k=BK, softcap=cap,
        window=win, segment_ids=ids,
    )
    seg = ids[:, None, :, None] == ids[:, None, None, :]
    o_r, lse_r = reference_attention(
        q, k, v, causal=True, window=win, softcap=cap, mask=seg
    )
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)


# ---------------------------------------------------------------------------
# ALiBi
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_alibi_matches_oracle(causal):
    """In-kernel ALiBi bias (-slope_h * |distance|) vs the dense oracle
    with the materialized bias matrix."""
    from flashattention_tpu.ops.api import alibi_slopes

    b, h, n, d = 1, 4, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    slopes = alibi_slopes(h)
    o, lse = pallas_attention(
        q, k, v, causal=causal, block_q=BQ, block_k=BK, alibi_slopes=slopes
    )
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    bias = -slopes[:, None, None] * jnp.abs(cols - rows).astype(jnp.float32)
    o_r, lse_r = reference_attention(q, k, v, causal=causal, bias=bias)
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)
    # the bias must actually matter
    o_nb, _ = reference_attention(q, k, v, causal=causal)
    assert np.abs(np.asarray(o_nb, np.float32)
                  - np.asarray(o_r, np.float32)).max() > 1e-3


def test_alibi_grads_and_decode_offset():
    """Grads through the ALiBi kernels (bias is linear in s — no extra
    chain), and q_offset keeps decode position-correct: the last row of a
    full forward equals a q_len=1 call at the same absolute position."""
    from flashattention_tpu.ops.api import alibi_slopes

    b, h, n, d = 1, 2, 192, 64
    q, k, v = make_qkv(b, h, n, d)
    slopes = alibi_slopes(h)

    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n)[None, :]
    bias = -slopes[:, None, None] * jnp.abs(cols - rows).astype(jnp.float32)

    def loss_p(t):
        o, _ = pallas_attention(
            t[0], t[1], t[2], causal=True, block_q=BQ, block_k=BK,
            alibi_slopes=slopes,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_r(t):
        o, _ = reference_attention(t[0], t[1], t[2], causal=True, bias=bias)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_p)((q, k, v))
    gr = jax.grad(loss_r)((q, k, v))
    for a, bb in zip(gp, gr):
        assert_allclose(a, bb, rtol=5e-3, atol=5e-3)

    # decode: q_len=1 at position n-1 (default bottom-aligned offset)
    o_full, _ = pallas_attention(
        q, k, v, causal=True, block_q=BQ, block_k=BK, alibi_slopes=slopes
    )
    o_dec, _ = pallas_attention(
        q[:, :, -1:], k, v, causal=True, block_q=BQ, block_k=BK,
        alibi_slopes=slopes,
    )
    assert_allclose(o_dec[:, :, 0], o_full[:, :, -1], rtol=1e-4, atol=1e-4)


def test_alibi_slopes_schedule():
    from flashattention_tpu.ops.api import alibi_slopes

    s8 = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s8, [2.0 ** (-(i + 1)) for i in range(8)],
                               rtol=1e-6)
    s6 = np.asarray(alibi_slopes(6))
    assert s6.shape == (6,) and (s6 > 0).all()


# ---------------------------------------------------------------------------
# Attention sinks (StreamingLLM)
# ---------------------------------------------------------------------------


def test_sinks_match_oracle_and_grads():
    """window + sinks: the first `sinks` keys stay visible to every row on
    top of the sliding band; o/lse and grads vs the dense oracle. The
    sink region spans a tile boundary fragment (sinks=40 < BQ) so the
    partial-sink-tile masking is exercised."""
    b, h, n, d, win, sinks = 1, 2, 512, 64, 96, 40
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_attention(
        q, k, v, causal=True, block_q=BQ, block_k=BK, window=win,
        sinks=sinks,
    )
    o_r, lse_r = reference_attention(
        q, k, v, causal=True, window=win, sinks=sinks
    )
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)
    # sinks must actually matter vs plain window
    o_w, _ = reference_attention(q, k, v, causal=True, window=win)
    assert np.abs(np.asarray(o_w, np.float32)
                  - np.asarray(o_r, np.float32)).max() > 1e-3

    def loss_p(t):
        o, _ = pallas_attention(
            t[0], t[1], t[2], causal=True, block_q=BQ, block_k=BK,
            window=win, sinks=sinks,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_r(t):
        o, _ = reference_attention(
            t[0], t[1], t[2], causal=True, window=win, sinks=sinks
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_p)((q, k, v))
    gr = jax.grad(loss_r)((q, k, v))
    for a, bb in zip(gp, gr):
        assert_allclose(a, bb, rtol=5e-3, atol=5e-3)


def test_sinks_validation():
    q, k, v = make_qkv(1, 1, 128, 64)
    with pytest.raises(ValueError, match="sinks require window"):
        pallas_attention(q, k, v, causal=True, sinks=4)


# ---------------------------------------------------------------------------
# Lagged-max forward frame (FAT_FWD_LAGGED_MAX — pallas_attn._fwd_kernel).
# Mathematically identical to the standard online softmax whenever one
# tile's rowmax exceeds the previous running max by < 60; these tests pin
# the exact domain AND the graceful (NaN-free) behavior outside it.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
def test_lagged_max_matches_oracle(causal, monkeypatch):
    monkeypatch.setenv("FAT_FWD_LAGGED_MAX", "1")
    b, h, n, d = 1, 2, 384, 64
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_attention(q, k, v, causal=causal, block_q=BQ, block_k=BK)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


def test_lagged_max_extreme_scores_no_nan(monkeypatch):
    """Adversarial score ranges: large positive (frame-0 overshoot), large
    negative (upward rebase), and a big mid-sequence jump. Within the
    +/-60-per-tile domain the outputs must still match the oracle; in all
    cases they must be finite."""
    monkeypatch.setenv("FAT_FWD_LAGGED_MAX", "1")
    b, h, n, d = 1, 1, 384, 64
    for scale_q, scale_k, jump in [(5.0, 5.0, 0.0), (-4.0, 4.0, 0.0),
                                   (1.0, 1.0, 40.0)]:
        q, k, v = make_qkv(b, h, n, d)
        q = q * scale_q
        k = k * scale_k
        if jump:
            # One late key made hugely attractive for every query: the
            # running max jumps by ~jump at its tile.
            k = k.at[:, :, 300, :].set(jnp.ones((d,), k.dtype) * jump / 8)
            q = q + 0.1  # keep q . k_300 positive and large
        o, lse = pallas_attention(q, k, v, block_q=BQ, block_k=BK)
        o_ref, lse_ref = reference_attention(q, k, v)
        assert np.isfinite(np.asarray(o, np.float32)).all()
        assert np.isfinite(np.asarray(lse, np.float32)).all()
        assert_allclose(o, o_ref, rtol=5e-4, atol=5e-4)
        assert_allclose(lse, lse_ref, rtol=5e-3, atol=5e-3)


def test_lagged_max_windows_segments_dropout(monkeypatch):
    monkeypatch.setenv("FAT_FWD_LAGGED_MAX", "1")
    b, h, n, d = 1, 2, 384, 64
    q, k, v = make_qkv(b, h, n, d)
    o, lse = pallas_attention(q, k, v, causal=True, window=100,
                              block_q=BQ, block_k=BK)
    o_r, lse_r = reference_attention(q, k, v, causal=True, window=100)
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)

    ids = jnp.asarray(np.repeat([0, 1, 2], [100, 150, 134])[None, :])
    ids = jnp.tile(ids, (b, 1))
    o, lse = pallas_attention(q, k, v, causal=True, segment_ids=ids,
                              block_q=BQ, block_k=BK)
    o_r, lse_r = reference_attention(
        q, k, v, causal=True, mask=_seg_mask(ids, ids)
    )
    assert_allclose(o, o_r, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_r, rtol=LSE_TOL, atol=LSE_TOL)

    # dropout: same seed bit-identical, LSE unchanged vs no-dropout
    o_a, lse_d = pallas_attention(q, k, v, block_q=BQ, block_k=BK,
                                  dropout_rate=0.3, dropout_seed=1)
    o_a2, _ = pallas_attention(q, k, v, block_q=BQ, block_k=BK,
                               dropout_rate=0.3, dropout_seed=1)
    o_nd, lse_nd = pallas_attention(q, k, v, block_q=BQ, block_k=BK)
    np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_a2))
    assert_allclose(lse_d, lse_nd, rtol=LSE_TOL, atol=LSE_TOL)


def test_lagged_max_grads(monkeypatch):
    """The backward consumes only (o, lse) residuals — lagged forward must
    compose with jax.grad exactly like the standard forward."""
    monkeypatch.setenv("FAT_FWD_LAGGED_MAX", "1")
    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(7), (b, h, n, d), dtype=jnp.float32)

    def loss(q_, k_, v_):
        o, _ = pallas_attention(q_, k_, v_, causal=True,
                                block_q=BQ, block_k=BK)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq_r, dk_r, dv_r = reference_attention_grads(q, k, v, do, causal=True)
    assert_allclose(dq, dq_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dk, dk_r, rtol=2e-3, atol=2e-3)
    assert_allclose(dv, dv_r, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_bwd_q_slab_decomposition_matches_resident(causal, monkeypatch):
    """Non-resident backward shapes decompose over q-slabs (round 5, the
    d=256 long-N fix): each slab runs the fused RESIDENT kernel with
    causally-truncated K/V, dQ rows concatenate, dK/dV sum. Forcing a tiny
    VMEM budget triggers the path at CPU shapes; grads must match the
    single-call resident backward (fp32 exact-class)."""
    import flashattention_tpu.ops.pallas_attn as pa

    q, k, v = make_qkv(1, 2, 1024, 64, dtype=jnp.float32)
    do = jax.random.normal(jax.random.key(9), q.shape, dtype=jnp.float32)

    def grads():
        def loss(q_, k_, v_):
            o, _ = pallas_attention(
                q_, k_, v_, causal=causal, block_q=128, block_k=128
            )
            return jnp.sum(o * do)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    g_full = grads()
    # Budget window: too small for resident (est ~786 KB at this shape)
    # but big enough that a >=1-block-q slab fits.
    monkeypatch.setenv("FAT_BWD_VMEM_BUDGET", "600000")
    calls = []
    orig = pa._flash_bwd

    def spy(*a, **kw):
        calls.append(kw.get("n_q"))
        return orig(*a, **kw)

    monkeypatch.setattr(pa, "_flash_bwd", spy)
    g_slab = grads()
    assert len(calls) > 2, f"slab path did not recurse: {calls}"
    for a, b in zip(g_full, g_slab):
        assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # Slab must NOT engage when the caller owns the geometry (explicit
    # q_offset) — it falls back to the split pair instead.
    calls.clear()

    def loss_off(q_, k_, v_):
        o, _ = pallas_attention(
            q_[:, :, :512], k_, v_, causal=True, block_q=128, block_k=128,
            q_offset=512,
        )
        return jnp.sum(o * do[:, :, :512])

    jax.grad(loss_off, argnums=(0, 1, 2))(q, k, v)
    assert len(calls) == 1, calls


def test_lagged_gate_alibi_steep_slopes_and_deep_softcap(monkeypatch):
    """Round-5 correctness find: the lagged-max frame's +60 clamp assumes
    one tile's rowmax never exceeds the previous running max by >= 60.
    Causal ALiBi VIOLATES that structurally (the rowmax climbs by
    slope * block_k per KV tile — 3.9 abs output error at slope 0.5,
    block 512, N=1000), and softcap > 30 can too (climb <= 2*cap). The
    kernel must fall back to the standard schedule for those configs —
    lagged env ON must produce standard-path outputs exactly."""
    q, k, v = make_qkv(1, 2, 1000, 64, dtype=jnp.float32)
    steep = jnp.asarray([0.25, 0.5])  # H=8's standard schedule peaks at 0.5
    for kw in (
        dict(alibi_slopes=steep),
        dict(softcap=50.0),
    ):
        monkeypatch.setenv("FAT_FWD_LAGGED_MAX", "0")
        o_std, lse_std = pallas_attention(
            q, k, v, causal=True, block_q=256, block_k=512, **kw
        )
        monkeypatch.setenv("FAT_FWD_LAGGED_MAX", "1")
        o_lag, lse_lag = pallas_attention(
            q, k, v, causal=True, block_q=256, block_k=512, **kw
        )
        np.testing.assert_array_equal(np.asarray(o_lag), np.asarray(o_std))
        np.testing.assert_array_equal(
            np.asarray(lse_lag), np.asarray(lse_std)
        )


@pytest.mark.parametrize("subs", ["2", "4"])
def test_fwd_subtile_interleave_parity(subs, monkeypatch):
    """FAT_FWD_SUBTILES (the d=64 MXU/VPU-overlap lever) must reproduce
    the single-pass tile results across causal/window/sinks/softcap and
    both lagged modes (fp32 CPU: exact class)."""
    q, k, v = make_qkv(1, 2, 1000, 64, dtype=jnp.float32)
    for lag in ("0", "1"):
        monkeypatch.setenv("FAT_FWD_LAGGED_MAX", lag)
        for kw in (
            dict(causal=True),
            dict(causal=False),
            dict(causal=True, window=256, sinks=32),
            dict(causal=True, softcap=20.0),
        ):
            monkeypatch.delenv("FAT_FWD_SUBTILES", raising=False)
            o1, l1 = pallas_attention(
                q, k, v, block_q=256, block_k=512, **kw
            )
            monkeypatch.setenv("FAT_FWD_SUBTILES", subs)
            o2, l2 = pallas_attention(
                q, k, v, block_q=256, block_k=512, **kw
            )
            monkeypatch.delenv("FAT_FWD_SUBTILES")
            assert_allclose(o2, o1, rtol=1e-5, atol=1e-5)
            assert_allclose(l2, l1, rtol=1e-4, atol=1e-4)


def test_softcap_impl_default_exp_under_interpret_on_tpu(monkeypatch):
    """The recip chain's interpret emulation of pl.reciprocal(approx=True)
    is ~6x coarser than hardware, so the DEFAULT impl must fall back to the
    exact exp chain whenever the launch is interpreted — even on a process
    whose default backend is TPU (ADVICE r5). Kernels are module-level, so
    the launchers bind _SOFTCAP_INTERPRET around the pallas_call invocation
    (_softcap_launch); an explicit FAT_SOFTCAP_IMPL is honored anywhere."""
    from flashattention_tpu.ops import pallas_attn as pa

    monkeypatch.delenv("FAT_SOFTCAP_IMPL", raising=False)
    monkeypatch.setattr(pa.jax, "default_backend", lambda: "tpu")
    x = jnp.float32(0.37)
    exact = pa._mosaic_tanh(x)
    tok = pa._SOFTCAP_INTERPRET.set(True)
    try:
        y_interp = pa._softcap_tanh(x)
    finally:
        pa._SOFTCAP_INTERPRET.reset(tok)
    # interpret default == exp chain exactly (same trace, same value)
    assert float(jnp.abs(y_interp - exact)) == 0.0
    # explicit env wins even under interpret
    monkeypatch.setenv("FAT_SOFTCAP_IMPL", "poly")
    tok = pa._SOFTCAP_INTERPRET.set(True)
    try:
        y_poly = pa._softcap_tanh(x)
    finally:
        pa._SOFTCAP_INTERPRET.reset(tok)
    assert float(jnp.abs(y_poly - exact)) > 1e-6  # poly != exp chain
    # _softcap_launch restores the var even when the call raises
    def boom(*a):
        raise RuntimeError("x")
    try:
        pa._softcap_launch(boom, True)
    except RuntimeError:
        pass
    assert pa._SOFTCAP_INTERPRET.get() is False
