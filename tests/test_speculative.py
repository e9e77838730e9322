"""Speculative decoding tests (serving/speculative.py).

New scope beyond the reference (which has no generation loop at all —
SURVEY.md §2.3): pins the two guarantees the module docstring makes:
greedy mode reproduces the target model's greedy continuation EXACTLY,
and with draft == target the rejection test accepts every proposal (the
p_t/p_d = 1 identity that underwrites distribution preservation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.models.transformer import (
    TransformerConfig,
    decode_chunk,
    decode_step,
    init_kv_cache,
    init_transformer,
)
from flashattention_tpu.serving.sampling import SamplingConfig
from flashattention_tpu.serving.speculative import (
    generate,
    speculative_generate,
)

TARGET = TransformerConfig(
    vocab_size=61,
    d_model=64,
    n_layers=2,
    n_heads=4,
    d_ff=128,
    max_seq_len=64,
    block_size=32,
    dropout_rate=0.0,
    dtype=jnp.float32,
    attention_backend="xla",
)
DRAFT = TransformerConfig(
    vocab_size=61,
    d_model=32,
    n_layers=1,
    n_heads=2,
    d_ff=64,
    max_seq_len=64,
    block_size=32,
    dropout_rate=0.0,
    dtype=jnp.float32,
    attention_backend="xla",
)


@pytest.fixture(scope="module")
def target_params():
    return init_transformer(jax.random.key(0), TARGET)


@pytest.fixture(scope="module")
def draft_params():
    return init_transformer(jax.random.key(7), DRAFT)


def test_decode_chunk_matches_stepwise(target_params):
    """decode_chunk row j must equal the sequential decode_step logits at
    the same absolute position — the property speculative verification
    relies on."""
    toks = jax.random.randint(jax.random.key(1), (2, 10), 0, TARGET.vocab_size)
    pre, chunk = toks[:, :4], toks[:, 4:]

    caches = init_kv_cache(TARGET, 2, 16, dtype=jnp.float32)
    _, caches = decode_chunk(target_params, caches, pre, jnp.int32(0), TARGET)
    chunk_logits, _ = decode_chunk(
        target_params, caches, chunk, jnp.int32(4), TARGET
    )

    caches = init_kv_cache(TARGET, 2, 16, dtype=jnp.float32)
    step_logits = []
    for i in range(10):
        li, caches = decode_step(
            target_params, caches, toks[:, i: i + 1], jnp.int32(i), TARGET
        )
        step_logits.append(li)
    ref = jnp.stack(step_logits[4:], axis=1)  # rows for positions 4..9

    np.testing.assert_allclose(
        np.asarray(chunk_logits), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_greedy_exactness(target_params, draft_params, gamma):
    """Greedy speculative output == greedy token-by-token decode, for any
    draft model and gamma."""
    prompt = [3, 17, 42, 9]
    want = generate(target_params, TARGET, prompt, max_new_tokens=20)
    got, stats = speculative_generate(
        target_params, draft_params, TARGET, DRAFT, prompt,
        max_new_tokens=20, gamma=gamma,
    )
    assert got == want
    assert stats.emitted >= len(got)
    assert stats.rounds >= 1
    # Every round emits at least one token -> at most 20 rounds.
    assert stats.rounds <= 20


def test_draft_equals_target_accepts_everything_greedy(target_params):
    got, stats = speculative_generate(
        target_params, target_params, TARGET, TARGET, [5, 11],
        max_new_tokens=16, gamma=4,
    )
    assert stats.accepted == stats.proposed
    assert got == generate(target_params, TARGET, [5, 11], max_new_tokens=16)
    # gamma+1 tokens per round when everything is accepted.
    assert stats.tokens_per_target_pass > 4.0


def test_draft_equals_target_accepts_everything_stochastic(target_params):
    """With draft == target, p_t/p_d == 1 at every proposal, so the
    Leviathan acceptance test must accept all of them — a direct check of
    the probability bookkeeping (filtered dists, not raw logits)."""
    cfg = SamplingConfig(temperature=0.9, top_k=20, top_p=0.95)
    _, stats = speculative_generate(
        target_params, target_params, TARGET, TARGET, [5, 11],
        max_new_tokens=16, gamma=4, sampling=cfg, key=jax.random.key(3),
    )
    assert stats.proposed > 0
    assert stats.accepted == stats.proposed


def test_stochastic_runs_and_is_valid(target_params, draft_params):
    cfg = SamplingConfig(temperature=1.0, top_k=0, top_p=1.0)
    out, stats = speculative_generate(
        target_params, draft_params, TARGET, DRAFT, [2, 4, 8],
        max_new_tokens=12, gamma=3, sampling=cfg, key=jax.random.key(5),
    )
    assert len(out) == 12
    assert all(0 <= t < TARGET.vocab_size for t in out)
    assert 0 <= stats.accepted <= stats.proposed
    assert stats.emitted >= len(out)


def test_max_len_edge(target_params, draft_params):
    """Generation terminates cleanly at the cache limit; the fallback
    (no-headroom) path still advances token by token."""
    prompt = list(range(1, TARGET.max_seq_len - 4))
    out, stats = speculative_generate(
        target_params, draft_params, TARGET, DRAFT, prompt,
        max_new_tokens=32, gamma=4,
    )
    assert len(prompt) + len(out) <= TARGET.max_seq_len + 1
    assert len(out) >= 1
    want = generate(target_params, TARGET, prompt, max_new_tokens=32)
    assert out == want[: len(out)]


def test_validation_errors(target_params, draft_params):
    with pytest.raises(ValueError, match="gamma"):
        speculative_generate(
            target_params, draft_params, TARGET, DRAFT, [1],
            max_new_tokens=4, gamma=0,
        )
    with pytest.raises(ValueError, match="PRNG"):
        speculative_generate(
            target_params, draft_params, TARGET, DRAFT, [1],
            max_new_tokens=4, sampling=SamplingConfig(temperature=1.0),
        )
    with pytest.raises(ValueError, match="non-empty"):
        speculative_generate(
            target_params, draft_params, TARGET, DRAFT, [],
            max_new_tokens=4,
        )
