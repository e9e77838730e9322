"""Oracle self-checks: the dense reference must match jax.nn softmax attention
and its causal mask must be correct for any (B, H) — the reference's oracle
crashes whenever B*H != N (bug B1); these tests pin the fixed behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.ops.reference import (
    causal_mask,
    reference_attention,
)
from flashattention_tpu.utils.testing import assert_allclose, make_qkv


def _dense_softmax_attention(q, k, v, causal, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        n_q, n_k = q.shape[-2], k.shape[-2]
        m = causal_mask(n_q, n_k)
        s = jnp.where(m, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("shape", [(1, 2, 16, 32), (2, 1, 33, 64), (3, 5, 24, 16)])
@pytest.mark.parametrize("causal", [False, True])
def test_oracle_matches_dense_softmax(shape, causal):
    b, h, n, d = shape
    q, k, v = make_qkv(b, h, n, d)
    o, lse = reference_attention(q, k, v, causal=causal)
    expected = _dense_softmax_attention(q, k, v, causal, d**-0.5)
    assert_allclose(o, expected, rtol=1e-5, atol=1e-5)
    # lse must reproduce softmax denominators
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d**-0.5)
    if causal:
        s = jnp.where(causal_mask(n, n), s, -jnp.inf)
    expected_lse = jax.scipy.special.logsumexp(s, axis=-1)
    assert_allclose(lse, expected_lse, rtol=1e-5, atol=1e-5)


def test_oracle_causal_any_bh():
    # Bug B1 regression: reference oracle crashed whenever B*H != N.
    q, k, v = make_qkv(4, 3, 16, 8)  # B*H = 12 != 16 = N
    o, lse = reference_attention(q, k, v, causal=True)
    assert o.shape == (4, 3, 16, 8)
    assert lse.shape == (4, 3, 16)
    assert np.all(np.isfinite(np.asarray(o, dtype=np.float32)))


def test_causal_mask_decode_offset():
    # q_len != k_len: query i maps to absolute position i + (k_len - q_len)
    # (reference look_ahead_mask_, flashattention_pytorch.py:176-190).
    m = causal_mask(2, 5)
    expected = np.array(
        [
            [True, True, True, True, False],
            [True, True, True, True, True],
        ]
    )
    np.testing.assert_array_equal(np.asarray(m), expected)
