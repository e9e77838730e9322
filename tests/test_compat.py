"""Full-model golden parity: the reference's ENTIRE ``Transformer`` run via
``models.compat`` with transplanted weights.

Extends test_reference_parity.py one level up: not just the attention core
or the MHA module, but embedding scaling, learned positions, both per-layer
attention blocks (including the reference's non-causal "ffn"), post-LN
residual order, and the LM head — eval-mode logits and cross-entropy must
match the torch model on the same checkpoint (BASELINE.md "end-to-end
perplexity within tolerances").
"""

from __future__ import annotations

import importlib.util
import math
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from flashattention_tpu.models.compat import (
    apply_reference_transformer,
    convert_reference_state_dict,
    reference_lm_loss,
)

REF_MODULE = pathlib.Path(
    "/root/reference/src/fa3/torch/flashattention_pytorch.py"
)

pytestmark = pytest.mark.skipif(
    not REF_MODULE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_l6():
    spec = importlib.util.spec_from_file_location("ref_fa3_module", REF_MODULE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build(ref_l6, *, fused, seed=0):
    """Tiny reference Transformer in eval mode + a seeded token batch.

    N=24 with block_size=16 exercises the reference ForwardPass's ragged
    final tile; dropout=0 so eval == the deterministic math."""
    vocab, d_model, heads, layers, max_len = 97, 32, 4, 2, 64
    torch.manual_seed(seed)
    model = ref_l6.Transformer(
        vocab_size=vocab, d_model=d_model, num_heads=heads,
        num_layers=layers, d_ff=48, dropout=0.0, max_len=max_len,
        use_fused_qkv=fused, block_size=16,
    ).eval()
    b, n = 2, 24
    ids = torch.randint(1, vocab, (b, n), generator=torch.Generator().manual_seed(3))
    return model, ids, heads, n


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("tau", [1.0, 0.8])
def test_full_model_logits_parity(ref_l6, fused, tau):
    model, ids, heads, n = _build(ref_l6, fused=fused)
    mask = ref_l6.look_ahead_mask_(n)
    with torch.no_grad():
        logits_ref = model(ids, tgt_mask=mask, tau=tau).numpy()

    params = convert_reference_state_dict(model.state_dict(), num_heads=heads)
    for backend in ("xla", "pallas"):
        logits = apply_reference_transformer(
            params, jnp.asarray(ids.numpy()), tau=tau, backend=backend
        )
        np.testing.assert_allclose(
            np.asarray(logits), logits_ref, rtol=1e-3, atol=1e-3
        )


def test_perplexity_parity(ref_l6):
    """Cross-entropy (hence perplexity) of a migrated checkpoint matches the
    reference's criterion on identical data."""
    model, ids, heads, n = _build(ref_l6, fused=True, seed=1)
    targets = torch.randint(1, 97, ids.shape,
                            generator=torch.Generator().manual_seed(5))
    mask = ref_l6.look_ahead_mask_(n)
    with torch.no_grad():
        logits_ref = model(ids, tgt_mask=mask, tau=1.0)
        loss_ref = torch.nn.functional.cross_entropy(
            logits_ref.reshape(-1, logits_ref.size(-1)), targets.reshape(-1)
        ).item()

    params = convert_reference_state_dict(model.state_dict(), num_heads=heads)
    loss = float(reference_lm_loss(
        params, jnp.asarray(ids.numpy()), jnp.asarray(targets.numpy())
    ))
    assert math.isfinite(loss)
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-4, atol=1e-4)


def test_convert_validates(ref_l6):
    model, ids, heads, n = _build(ref_l6, fused=True)
    sd = model.state_dict()
    with pytest.raises(ValueError, match="divisible"):
        convert_reference_state_dict(sd, num_heads=5)
    params = convert_reference_state_dict(sd, num_heads=heads)
    cfg = params["config"]
    assert (cfg.n_layers, cfg.d_model, cfg.vocab_size) == (2, 32, 97)
    too_long = jnp.zeros((1, cfg.max_len + 1), jnp.int32)
    with pytest.raises(ValueError, match="max_len"):
        apply_reference_transformer(params, too_long)


def test_bias_free_linear_checkpoints_forward():
    """_linear omits 'b' for nn.Linear(bias=False) checkpoints; the
    forward must treat the bias as optional too — it crashed with
    KeyError on exactly the checkpoints the converter accepted
    (review r5). Zero-bias and bias-free params must agree."""
    d, h = 8, 2
    w = jnp.asarray(np.random.default_rng(0).normal(size=(d, 3 * d)),
                    jnp.float32)
    wo = jnp.asarray(np.random.default_rng(1).normal(size=(d, d)),
                     jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, d)),
                    jnp.float32)
    from flashattention_tpu.models.compat import _self_attention

    free = {"qkv": {"w": w}, "o": {"w": wo}}
    zero = {"qkv": {"w": w, "b": jnp.zeros(3 * d)},
            "o": {"w": wo, "b": jnp.zeros(d)}}
    a = _self_attention(x, free, num_heads=h, tau=1.0, causal=True,
                        backend="xla")
    b = _self_attention(x, zero, num_heads=h, tau=1.0, causal=True,
                        backend="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
