"""Golden-parity tests against the reference's OWN code (BASELINE.md §(c)).

Every other test in this suite compares against the repo's own oracle; these
import the reference's *correct-math core* — `fa1_forward_torch` /
`fa1_backward_torch` (/root/reference/src/fa1/torch/impl.py:26-115, the only
reference implementation that passes its own suite; SURVEY.md §4.4) — run it
on identical seeded inputs, and diff o / lse / dq / dk / dv against this
framework's public API within the fp32 tolerance ladder.

The FP8 case replicates the reference C++ pre-pass *semantics*
(csrc/fa3/fa3_fwd.cu:32-101: strided-slice transform with temporaries,
alternating ±1 signs, per-block absmax fp16 clamp-quant) in torch here, feeds
both attention cores the same pre-processed inputs, and requires core parity
at the fp32 ladder. Note (documented in PARITY.md): the C++ transform fixes
reference bug B5's view-aliasing but is STILL not a Walsh–Hadamard transform
(H·Hᵀ ≠ d·I — verified in this session on d=8), so the reference fp8 path is
not score-preserving even in its C++ variant; this framework's
quant.hadamard_transform is a true orthonormal FWHT, hence attention parity
is pinned on identically-preprocessed inputs, not across the two transforms.

The reference module is loaded by file path (importlib) because importing the
`fa1` package pulls `triton` eagerly — reference quirk Q4 (src/fa1/op.py:2-5).
"""

from __future__ import annotations

import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flashattention_tpu.ops.api import flash_attention
from flashattention_tpu.utils.testing import assert_allclose, make_qkv

REF_IMPL = pathlib.Path("/root/reference/src/fa1/torch/impl.py")

pytestmark = pytest.mark.skipif(
    not REF_IMPL.exists(), reason="reference checkout not available"
)


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_fa1_impl", REF_IMPL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


def _to_torch_bh(x: jax.Array) -> "torch.Tensor":
    """(B, H, N, D) jax -> (B*H, N, D) torch fp32 (the reference's merged-bh
    layout, src/common/utils.py:3-9)."""
    b, h, n, d = x.shape
    return torch.from_numpy(np.array(x, np.float32).reshape(b * h, n, d))


SHAPES = [(1, 2, 16, 32), (2, 1, 33, 64), (2, 2, 33, 40)]
BR, BC = 16, 16


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_forward_matches_reference_core(ref, shape, causal, backend):
    b, h, n, d = shape
    q, k, v = make_qkv(b, h, n, d)
    scale = d**-0.5
    o_t, lse_t = ref.fa1_forward_torch(
        _to_torch_bh(q), _to_torch_bh(k), _to_torch_bh(v), causal, scale, BR, BC
    )
    o_ref = o_t.numpy().reshape(b, h, n, d)
    lse_ref = lse_t.numpy().reshape(b, h, n)

    o, lse = flash_attention(q, k, v, causal=causal, backend=backend)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("shape", [(1, 2, 16, 32), (2, 2, 33, 40)])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_backward_matches_reference_core(ref, shape, causal, backend):
    b, h, n, d = shape
    q, k, v = make_qkv(b, h, n, d)
    do = jax.random.normal(jax.random.key(9), (b, h, n, d), jnp.float32)
    scale = d**-0.5

    qt, kt, vt = _to_torch_bh(q), _to_torch_bh(k), _to_torch_bh(v)
    dot = _to_torch_bh(do)
    o_t, lse_t = ref.fa1_forward_torch(qt, kt, vt, causal, scale, BR, BC)
    dq_t, dk_t, dv_t = ref.fa1_backward_torch(
        qt, kt, vt, o_t, dot, lse_t, causal, scale, BR, BC
    )

    def loss(q_, k_, v_):
        o, _ = flash_attention(q_, k_, v_, causal=causal, backend=backend)
        return jnp.sum(o * do)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for ours, theirs in ((dq, dq_t), (dk, dk_t), (dv, dv_t)):
        assert_allclose(
            ours, theirs.numpy().reshape(b, h, n, d), rtol=1e-3, atol=1e-3
        )


# ---------------------------------------------------------------------------
# FP8: reference C++ pre-pass semantics (csrc/fa3/fa3_fwd.cu:32-101)
# ---------------------------------------------------------------------------


def _cpp_incoherent_process(q: "torch.Tensor", k: "torch.Tensor"):
    """Verbatim fa3_fwd.cu:32-67 semantics: alternating ±1 signs
    ((i % 2) * 2 - 1), strided-slice butterfly WITH temporaries (fixes bug
    B5's aliasing; still not an orthogonal transform), ÷ sqrt(d)."""
    d = q.size(-1)
    if d & (d - 1):
        return q, k

    def transform(x):
        x = x.to(torch.float32).clone()
        hh = 1
        while hh < d:
            a = x[:, :, 0 :: 2 * hh]
            c = x[:, :, hh :: 2 * hh]
            apc, amc = a + c, a - c
            x[:, :, 0 :: 2 * hh] = apc
            x[:, :, hh :: 2 * hh] = amc
            hh *= 2
        return x / (d**0.5)

    sign = ((torch.arange(d) % 2) * 2 - 1).to(torch.float32)
    return transform(q * sign), transform(k * sign)


def _cpp_block_quant_dequant(x: "torch.Tensor", block: int) -> "torch.Tensor":
    """fa3_fwd.cu:70-101: per-(bh, seq-block) absmax scale (clamp_min 1e-6),
    fp16 x/scale -> clamp(-1, 1) -> x*scale round trip."""
    out = torch.empty_like(x, dtype=torch.float16)
    n = x.size(1)
    for s in range(0, n, block):
        blk = x[:, s : s + block]
        scale = blk.abs().to(torch.float32).amax(dim=(1, 2)).clamp_min(1e-6)
        sc = scale.to(torch.float16).view(-1, 1, 1)
        y = (blk.to(torch.float16) / sc).clamp(-1.0, 1.0)
        out[:, s : s + block] = y * sc
    return out.to(torch.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_fp8_core_matches_reference_on_identical_quantized_inputs(ref, causal):
    """The C++ FA3 fp8 forward = pre-pass + the FA1 core (fa3_fwd.cu:134-146
    backward re-quantizes the same way). Feed both cores identically
    pre-processed inputs; outputs must agree at the fp32 ladder."""
    b, h, n, d = 2, 2, 32, 32
    q, k, v = make_qkv(b, h, n, d)
    scale = d**-0.5

    qt, kt, vt = _to_torch_bh(q), _to_torch_bh(k), _to_torch_bh(v)
    qr, kr = _cpp_incoherent_process(qt, kt)
    qq = _cpp_block_quant_dequant(qr, BR)
    kq = _cpp_block_quant_dequant(kr, BC)
    vq = _cpp_block_quant_dequant(vt, BC)

    o_t, lse_t = ref.fa1_forward_torch(qq, kq, vq, causal, scale, BR, BC)

    to_jax = lambda t: jnp.asarray(t.numpy().reshape(b, h, n, d))
    for backend in ("xla", "pallas"):
        o, lse = flash_attention(
            to_jax(qq), to_jax(kq), to_jax(vq), causal=causal, backend=backend
        )
        assert_allclose(o, o_t.numpy().reshape(b, h, n, d), rtol=1e-4, atol=1e-4)
        assert_allclose(
            lse, lse_t.numpy().reshape(b, h, n), rtol=1e-3, atol=1e-3
        )


def test_cpp_transform_is_not_hadamard():
    """Pin the documented finding (PARITY.md): the reference C++ strided
    transform is NOT orthogonal (H·Hᵀ ≠ d·I), while this framework's FWHT is
    orthonormal — the reason our fp8 path pins parity on identically
    preprocessed inputs rather than across transforms."""
    d = 8
    eye = torch.eye(d).unsqueeze(1)  # (d, 1, d) rows = basis vectors
    hq, _ = _cpp_incoherent_process(eye, eye)
    H = hq.squeeze(1).numpy()  # includes sign diag and /sqrt(d)
    gram = H @ H.T
    assert not np.allclose(gram, np.eye(d), atol=1e-5)

    from flashattention_tpu.ops.quant import hadamard_transform

    Hj = np.asarray(hadamard_transform(jnp.eye(d), normalize=True))
    np.testing.assert_allclose(Hj @ Hj.T, np.eye(d), atol=1e-5)


# ---------------------------------------------------------------------------
# Module-level parity: the reference's MultiHeadAttention (L6) vs this
# framework's attention layer, identical weights
# ---------------------------------------------------------------------------

REF_MODULE = pathlib.Path(
    "/root/reference/src/fa3/torch/flashattention_pytorch.py"
)


@pytest.fixture(scope="module")
def ref_l6():
    """Load the reference's model module by path (its only module-level
    statement is a cpu/cuda device pick, ln 677; safe to import)."""
    spec = importlib.util.spec_from_file_location("ref_fa3_module", REF_MODULE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("fused", [True, False])
def test_mha_module_parity(ref_l6, fused):
    """Reference MultiHeadAttention (flashattention_pytorch.py:18-92) vs
    models/transformer._attention with the SAME weights: pins the fused-QKV
    chunk order, the (B, N, H, dh)-transpose head split, the causal mask
    convention (look_ahead_mask_, ln 176-190), and the output projection —
    not just the kernel core."""
    from flashattention_tpu.models.transformer import (
        TransformerConfig, _attention,
    )

    d_model, heads, b, n = 64, 4, 2, 48
    torch.manual_seed(0)
    mha = ref_l6.MultiHeadAttention(
        d_model, heads, dropout=0.0, use_fused_qkv=fused
    ).eval()

    x_t = torch.randn(b, n, d_model)
    mask = ref_l6.look_ahead_mask_(n)
    with torch.no_grad():
        out_ref = mha(x_t, x_t, x_t, tau=1.0, mask=mask).numpy()

    # torch Linear stores weight as (out, in); ours is x @ W -> (in, out).
    def wb(lin):
        return (
            jnp.asarray(lin.weight.detach().numpy().T),
            jnp.asarray(lin.bias.detach().numpy()),
        )

    if fused:
        w, bias = wb(mha.w_qkv)
        p = {"w_qkv": w, "b_qkv": bias}
    else:
        p = {}
        for name, lin in (("q", mha.w_q), ("k", mha.w_k), ("v", mha.w_v)):
            p[f"w_{name}"], p[f"b_{name}"] = wb(lin)
    p["w_o"], p["b_o"] = wb(mha.w_o)

    cfg = TransformerConfig(
        d_model=d_model, n_heads=heads, fused_qkv=fused, dropout_rate=0.0,
        block_size=16, dtype=jnp.float32, attention_backend="xla",
    )
    out, _ = _attention(
        jnp.asarray(x_t.numpy()), p, cfg,
        dropout_key=None, train=False, sparse_mask=None,
    )
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4, rtol=1e-4)
