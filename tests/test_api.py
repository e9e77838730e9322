"""Dispatch API + backend-consistency tests (the reference's archetype-5,
tests/test_correctness_fa1.py:113-150) and FP8/FA3 + spec tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu import (
    fa1_attention,
    fa2_attention,
    fa3_attention,
    pick_fa1_spec,
    pick_fa2_spec,
    pick_fa3_spec,
)
from flashattention_tpu.ops import quant
from flashattention_tpu.ops.reference import reference_attention
from flashattention_tpu.utils.testing import (
    FP8_O_TOL,
    LSE_TOL,
    assert_allclose,
    make_qkv,
)

ALGOS = [fa1_attention, fa2_attention, fa3_attention]


@pytest.mark.parametrize("fn", ALGOS)
@pytest.mark.parametrize("causal", [False, True])
def test_algo_forward_vs_oracle(fn, causal):
    q, k, v = make_qkv(2, 2, 64, 64)
    o, lse = fn(q, k, v, causal=causal)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=LSE_TOL, atol=LSE_TOL)


@pytest.mark.parametrize("causal", [False, True])
def test_backend_consistency(causal):
    """All available backends agree on identical inputs (archetype-5)."""
    q, k, v = make_qkv(1, 2, 128, 64)
    outs = {}
    for backend in ("pallas", "xla", "reference"):
        o, lse = fa2_attention(q, k, v, causal=causal, backend=backend)
        outs[backend] = (np.asarray(o, np.float32), np.asarray(lse, np.float32))
    for b in ("pallas", "xla"):
        np.testing.assert_allclose(
            outs[b][0], outs["reference"][0], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            outs[b][1], outs["reference"][1], rtol=LSE_TOL, atol=LSE_TOL
        )


def test_bad_backend_raises():
    q, k, v = make_qkv(1, 1, 16, 32)
    with pytest.raises(ValueError):
        fa1_attention(q, k, v, backend="cuda")


def test_specs_are_tpu_aligned():
    for d in (32, 64, 128, 256):
        for pick in (pick_fa1_spec, pick_fa2_spec, pick_fa3_spec):
            pick(d).validate()


def test_fa3_fp8_vs_quantized_oracle():
    """FP8 output stays within the relaxed tolerance of the exact oracle, and
    matches a quantized-input oracle tightly (the well-defined version of the
    reference's unsatisfiable fp8 LSE check, bug B6)."""
    q, k, v = make_qkv(1, 2, 128, 64)
    o8, lse8 = fa3_attention(q, k, v, fp8=True, backend="xla")
    o_ref, _ = reference_attention(q, k, v)
    assert_allclose(o8, o_ref, rtol=FP8_O_TOL, atol=FP8_O_TOL)

    # Quantized-input oracle: same preprocessing, dense math.
    qr, kr = quant.incoherent_process(q, k, seed=0)
    qq = quant.fake_quant_fp8(qr, 128)
    kq = quant.fake_quant_fp8(kr, 128)
    vq = quant.fake_quant_fp8(v, 128)
    o_qref, lse_qref = reference_attention(qq, kq, vq)
    assert_allclose(o8, o_qref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse8, lse_qref, rtol=LSE_TOL, atol=LSE_TOL)


def test_hadamard_is_orthonormal():
    """Bug B5 regression: the transform must satisfy H H^T = I."""
    eye = jnp.eye(16, dtype=jnp.float32)
    h = quant.hadamard_transform(eye, normalize=True)
    hh = h @ h.T
    np.testing.assert_allclose(np.asarray(hh), np.eye(16), atol=1e-5)


def test_incoherent_process_preserves_scores():
    q, k, _ = make_qkv(1, 1, 8, 32)
    qr, kr = quant.incoherent_process(q, k, seed=1)
    s0 = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    s1 = jnp.einsum("bhqd,bhkd->bhqk", qr, kr)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-4)


def test_incoherent_process_noops_on_non_pow2():
    q, k, _ = make_qkv(1, 1, 8, 40)
    qr, kr = quant.incoherent_process(q, k)
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(q))


def test_fp8_quant_roundtrip_accuracy():
    q, _, _ = make_qkv(1, 2, 64, 64)
    x = quant.fake_quant_fp8(q, 32)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(q), rtol=0.1, atol=0.1
    )


def test_profiling_compiled_cost_and_timed():
    import jax.numpy as jnp

    from flashattention_tpu.ops.api import fa2_attention
    from flashattention_tpu.utils.profiling import compiled_cost, timed

    q = jnp.ones((1, 2, 128, 64), jnp.float32)
    cost = compiled_cost(
        lambda a, b, c: fa2_attention(a, b, c, backend="xla")[0], q, q, q
    )
    assert isinstance(cost, dict)
    t = timed(
        lambda a, b, c: fa2_attention(a, b, c, backend="xla")[0],
        q, q, q, iters=2, trials=1,
    )
    assert t > 0


def test_stages_knob_parity_and_validation():
    """`stages` (pipeline depth) must not change the math; bad values raise.

    On CPU the kernel runs in interpret mode where buffering is a no-op, but
    the argument threads through the full custom_vjp plumbing either way
    (the real double- vs single-buffer A/B lives in scripts/ablate_fwd.py).
    """
    from flashattention_tpu.ops.api import flash_attention

    q, k, v = make_qkv(1, 2, 256, 64)
    o2, lse2 = flash_attention(q, k, v, causal=True, backend="pallas")
    o1, lse1 = flash_attention(
        q, k, v, causal=True, backend="pallas", stages=1
    )
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse1), np.asarray(lse2), atol=1e-6)
    with pytest.raises(ValueError, match="stages"):
        flash_attention(q, k, v, backend="pallas", stages=3)


def test_fa_generation_specs_differ():
    """FA1 is the unpipelined generation; FA2/FA3 double-buffer (VERDICT r1:
    the three spec tables must not be numerically identical)."""
    s1, s2, s3 = pick_fa1_spec(128), pick_fa2_spec(128), pick_fa3_spec(128)
    assert s1.stages == 1
    assert s2.stages == 2 and s3.stages == 2


def test_pallas_mask_fallback_warns():
    """Explicitly requesting pallas with a dense mask degrades to the tiled
    executor — loudly (the repo's own criticism of reference quirk Q5)."""
    import warnings as _w

    from flashattention_tpu.ops.api import flash_attention

    q, k, v = make_qkv(1, 1, 64, 32)
    mask = jnp.ones((64, 64), bool)
    with pytest.warns(UserWarning, match="tiled XLA executor"):
        flash_attention(q, k, v, backend="pallas", mask=mask)
    with _w.catch_warnings():
        _w.simplefilter("error")  # auto backend: no warning
        flash_attention(q, k, v, mask=mask)


def test_flash_attention_segment_ids_backends_agree():
    """segment_ids on the public API: the Pallas kernel path (in-kernel id
    compare) and the xla/tiled path (dense mask fold) must agree; the
    reference backend takes the dense mask directly."""
    from flashattention_tpu.ops.api import flash_attention

    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    ids = np.zeros((b, n), np.int32)
    ids[0, 100:] = 1
    ids = jnp.asarray(ids)
    o_p, lse_p = flash_attention(
        q, k, v, causal=True, backend="pallas", block_q=128, block_k=128,
        segment_ids=ids,
    )
    o_x, lse_x = flash_attention(
        q, k, v, causal=True, backend="xla", segment_ids=ids
    )
    o_r, lse_r = flash_attention(
        q, k, v, causal=True, backend="reference", segment_ids=ids
    )
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_r),
                               rtol=1e-4, atol=1e-4)


def test_softcap_all_backends_agree():
    """softcap on the public API: pallas (in-kernel), xla (tiled executor),
    and reference produce the same capped attention, including gradients
    on the tiled path."""
    from flashattention_tpu.ops.api import flash_attention
    from flashattention_tpu.ops.reference import reference_attention

    b, h, n, d = 1, 2, 256, 64
    q, k, v = make_qkv(b, h, n, d)
    q = q * 4.0
    cap = 10.0
    o_ref, lse_ref = reference_attention(q, k, v, causal=True, softcap=cap)
    for backend in ("pallas", "xla", "reference"):
        o, lse = flash_attention(
            q, k, v, causal=True, backend=backend, softcap=cap,
            block_q=128, block_k=128,
        )
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(o_ref), rtol=2e-4, atol=2e-4,
            err_msg=backend,
        )
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(lse_ref), rtol=1e-3, atol=1e-3,
            err_msg=backend,
        )

    # tiled-path gradient parity (the xla executor's hand-written vjp)
    def loss_t(t):
        o, _ = flash_attention(t[0], t[1], t[2], causal=True, backend="xla",
                               softcap=cap)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_r(t):
        o, _ = reference_attention(t[0], t[1], t[2], causal=True, softcap=cap)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gt = jax.grad(loss_t)((q, k, v))
    gr = jax.grad(loss_r)((q, k, v))
    for a, bb in zip(gt, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=5e-3, atol=5e-3,
        )


def test_alibi_api_backends_agree():
    from flashattention_tpu.ops.api import alibi_slopes, flash_attention
    from flashattention_tpu.ops.reference import reference_attention

    b, h, n, d = 1, 4, 192, 64
    q, k, v = make_qkv(b, h, n, d)
    slopes = alibi_slopes(h)
    o_p, lse_p = flash_attention(
        q, k, v, causal=True, backend="pallas", alibi_slopes=slopes,
        block_q=128, block_k=128,
    )
    o_x, lse_x = flash_attention(
        q, k, v, causal=True, backend="xla", alibi_slopes=slopes
    )
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_x),
                               rtol=1e-3, atol=1e-3)
    with pytest.raises(ValueError, match="alibi"):
        flash_attention(q, k, v, causal=True, backend="xla",
                        alibi_slopes=slopes, window=8)


def test_packed_qkv_wrappers():
    """flash-attn layout-compat wrappers: (B, N, 3, H, D) / kvpacked."""
    from flashattention_tpu.ops.api import (
        flash_attention,
        flash_attention_kvpacked,
        flash_attention_qkvpacked,
    )

    b, h, n, d = 2, 2, 128, 32
    q, k, v = make_qkv(b, h, n, d)
    o_ref, lse_ref = flash_attention(q, k, v, causal=True)
    qkv = jnp.stack(
        [q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
         v.transpose(0, 2, 1, 3)], axis=2
    )
    o1, lse1 = flash_attention_qkvpacked(qkv, causal=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o_ref))
    kv = jnp.stack(
        [k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)], axis=2
    )
    o2, _ = flash_attention_kvpacked(q.transpose(0, 2, 1, 3), kv, causal=True)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o_ref))
    with pytest.raises(ValueError, match="B, N, 3"):
        flash_attention_qkvpacked(q)
