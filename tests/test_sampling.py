"""Sampling (temperature / top-k / top-p) unit tests + engine integration.

The reference has no generation loop (its application trains and saves);
sampling is new serving scope — tested against exact distributional facts
rather than a reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.serving.sampling import SamplingConfig, sample_logits


def _logits(b=4, v=64, seed=0):
    return jax.random.normal(jax.random.key(seed), (b, v), jnp.float32) * 3.0


def test_greedy_is_argmax():
    x = _logits()
    out = sample_logits(x, None, SamplingConfig(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(x), -1))


def test_top_k_one_is_argmax_any_temperature():
    x = _logits(seed=1)
    out = sample_logits(
        x, jax.random.key(7), SamplingConfig(temperature=5.0, top_k=1)
    )
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(x), -1))


def test_deterministic_per_key_and_varies_across_keys():
    x = _logits(b=32, seed=2)
    cfg = SamplingConfig(temperature=1.0)
    a = np.asarray(sample_logits(x, jax.random.key(0), cfg))
    b = np.asarray(sample_logits(x, jax.random.key(0), cfg))
    c = np.asarray(sample_logits(x, jax.random.key(1), cfg))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_top_k_never_leaves_the_top_k_set():
    x = _logits(b=8, v=32, seed=3)
    k = 4
    cfg = SamplingConfig(temperature=2.0, top_k=k)
    topk = np.argsort(np.asarray(x), axis=-1)[:, -k:]
    for s in range(20):
        out = np.asarray(sample_logits(x, jax.random.key(s), cfg))
        for row in range(x.shape[0]):
            assert out[row] in topk[row]


def test_top_p_tiny_keeps_only_the_top_token():
    x = _logits(b=8, v=32, seed=4)
    cfg = SamplingConfig(temperature=1.0, top_p=1e-6)
    for s in range(5):
        out = np.asarray(sample_logits(x, jax.random.key(s), cfg))
        np.testing.assert_array_equal(out, np.argmax(np.asarray(x), -1))


def test_top_p_respects_nucleus():
    # One dominant token (p ~ 0.88) + tail: top_p=0.5 must always pick it.
    v = 16
    x = jnp.zeros((1, v)).at[0, 3].set(4.0)
    cfg = SamplingConfig(temperature=1.0, top_p=0.5)
    for s in range(10):
        assert int(sample_logits(x, jax.random.key(s), cfg)[0]) == 3


def test_temperature_sharpens():
    """Cold sampling concentrates on the argmax far more than hot sampling."""
    x = _logits(b=1, v=16, seed=5)
    best = int(np.argmax(np.asarray(x)))
    def rate(temp):
        cfg = SamplingConfig(temperature=temp)
        hits = sum(
            int(sample_logits(x, jax.random.key(s), cfg)[0]) == best
            for s in range(64)
        )
        return hits / 64
    assert rate(0.2) > rate(5.0)


def test_config_validation():
    with pytest.raises(ValueError):
        SamplingConfig(temperature=-1.0)
    with pytest.raises(ValueError):
        SamplingConfig(top_k=-1)
    with pytest.raises(ValueError):
        SamplingConfig(top_p=0.0)
    with pytest.raises(ValueError):
        sample_logits(_logits(), None, SamplingConfig(temperature=1.0))


def test_jit_composes():
    cfg = SamplingConfig(temperature=0.7, top_k=8, top_p=0.9)
    f = jax.jit(lambda x, k: sample_logits(x, k, cfg))
    out = f(_logits(), jax.random.key(0))
    assert out.shape == (4,) and out.dtype == jnp.int32


# -- engine integration ------------------------------------------------------


def _tiny_engine(sampling, seed=0):
    from flashattention_tpu.models.transformer import (
        TransformerConfig, init_transformer,
    )
    from flashattention_tpu.serving.engine import EngineConfig

    cfg = TransformerConfig(
        vocab_size=128, d_model=32, n_layers=1, n_heads=2, d_ff=64,
        max_seq_len=64, block_size=16, dropout_rate=0.0, dtype=jnp.float32,
    )
    params = init_transformer(jax.random.key(0), cfg)
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=64, max_seq_len=64,
        prefill_pad=16, sampling=sampling, seed=seed,
    )
    return params, cfg, ecfg


def test_engine_stochastic_decode_runs_and_is_seed_deterministic():
    from flashattention_tpu.serving.engine import GenerationRequest, ServingEngine

    sampling = SamplingConfig(temperature=1.0, top_k=16)
    params, cfg, ecfg = _tiny_engine(sampling, seed=11)

    def run():
        eng = ServingEngine(params, cfg, ecfg)
        eng.submit(GenerationRequest(request_id=1, prompt=[5, 9, 2],
                                     max_new_tokens=8))
        return eng.run()[1]

    a, b = run(), run()
    assert len(a) == 8
    assert a == b  # same engine seed -> same tokens

    import dataclasses

    ecfg2 = dataclasses.replace(ecfg, seed=99)
    eng = ServingEngine(params, cfg, ecfg2)
    eng.submit(GenerationRequest(request_id=1, prompt=[5, 9, 2],
                                 max_new_tokens=8))
    c = eng.run()[1]
    assert len(c) == 8  # different seed may (typically does) differ


# -- speculative acceptance (distribution preservation) ----------------------


def test_spec_accept_emit_preserves_target():
    """The first emitted token of a speculative round is marginally the
    TARGET's filtered distribution regardless of the draft (Leviathan et
    al. correctness): draft ~ q, accept with p/q, else sample the
    normalized residual. Empirical check over many keys at V=8."""
    import jax
    import jax.numpy as jnp

    from flashattention_tpu.serving.sampling import spec_accept_emit

    v, g = 8, 2
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(v), size=g + 1).astype(np.float32)
    q = rng.dirichlet(np.ones(v), size=g).astype(np.float32)
    p_dist = jnp.asarray(p)[None]          # (1, g+1, V)
    q_dist = jnp.asarray(q)[None]          # (1, g, V)

    def one(key):
        kd, ka = jax.random.split(key)
        draft = jax.random.categorical(
            kd, jnp.log(q_dist[0]), axis=-1)[None]  # (1, g) ~ q rows
        _, emit = spec_accept_emit(p_dist, q_dist, draft, ka)
        return emit[0, 0]

    n = 40_000
    toks = np.asarray(jax.vmap(one)(jax.random.split(jax.random.key(1), n)))
    emp = np.bincount(toks, minlength=v) / n
    # Binomial noise at n=40k: sigma <= 0.5/sqrt(n) ~ 0.0025; gate at 5x.
    np.testing.assert_allclose(emp, p[0], atol=0.0125)


def test_spec_accept_emit_self_draft_accepts_all():
    """q == p rows: acceptance ratio is 1 for every proposal, so a == g
    always, the draft tokens pass through and the bonus comes from the
    target's last row."""
    import jax
    import jax.numpy as jnp

    from flashattention_tpu.serving.sampling import spec_accept_emit

    v, g, b = 8, 3, 4
    rng = np.random.default_rng(2)
    p = rng.dirichlet(np.ones(v), size=(b, g + 1)).astype(np.float32)
    p_dist = jnp.asarray(p)
    q_dist = p_dist[:, :g]
    draft = jnp.asarray(rng.integers(0, v, size=(b, g)), jnp.int32)
    a, emit = spec_accept_emit(p_dist, q_dist, draft, jax.random.key(3))
    assert np.all(np.asarray(a) == g)
    np.testing.assert_array_equal(np.asarray(emit[:, :g]), np.asarray(draft))
