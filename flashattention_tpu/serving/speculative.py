"""Draft-model speculative decoding on the KV-cache decode path.

New serving scope (the reference has no generation loop at all): a small
draft model proposes ``gamma`` tokens autoregressively; the target model
scores all of them in ONE chunked forward (models.transformer.decode_chunk
— the same q_len>1 causal-offset machinery the chunked-prefill path uses);
accepted prefixes advance multiple tokens per target pass.

Guarantees:
- Greedy mode emits EXACTLY the target model's greedy continuation
  (pinned in tests/test_speculative.py against token-by-token decode).
- Stochastic mode uses Leviathan-style rejection sampling over the
  temperature/top-k/top-p-filtered distributions (serving/sampling.py):
  accept d_j with prob min(1, p_t(d_j)/p_d(d_j)); on rejection, sample from
  the normalized residual max(p_t - p_d, 0) — the emitted tokens are
  distributed exactly as target-model sampling.

Cache rollback is free by construction: both caches mask attention at
``cols <= rows + cache_index``, so entries past the accepted prefix are
invisible and simply overwritten by the next chunk write. The draft scan
runs gamma+1 steps (the last feeds d_gamma, its sample discarded) so the
draft cache always covers the longest possible accepted prefix.

Single-sequence by design: speculative decoding targets latency; the
continuous-batching engine (serving/engine.py) targets throughput.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_tpu.models.transformer import (
    TransformerConfig,
    _decode_chunk_impl,
    decode_chunk,
    init_kv_cache,
)
from flashattention_tpu.serving.sampling import SamplingConfig, filter_logits

__all__ = ["SpecStats", "speculative_generate", "generate"]


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    proposed: int = 0
    accepted: int = 0
    emitted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)

    @property
    def tokens_per_target_pass(self) -> float:
        return self.emitted / max(self.rounds, 1)


@functools.partial(
    jax.jit, static_argnames=("g", "cfg", "sampling"), donate_argnums=(1,)
)
def _propose(params, caches, t0, pos0, key, *, g, cfg, sampling):
    """Draft g tokens autoregressively from position pos0 (t0 = last
    accepted token, already counted at pos0). Runs g+1 steps so the final
    draft token's K/V lands in the cache too (see module docstring).

    Returns (tokens (g,), probs (g,) under the filtered draft dist — ones
    when greedy, caches)."""
    greedy = sampling is None or sampling.greedy

    def body(carry, i):
        caches, tok, key = carry
        logits, caches = _decode_chunk_impl(
            params, caches, tok.reshape(1, 1), pos0 + i, cfg
        )
        row = logits[0, -1]
        if greedy:
            nxt = jnp.argmax(row).astype(jnp.int32)
            prob = jnp.float32(1.0)
        else:
            key, sub = jax.random.split(key)
            filt = filter_logits(row, sampling)
            nxt = jax.random.categorical(sub, filt).astype(jnp.int32)
            prob = jax.nn.softmax(filt)[nxt]
        return (caches, nxt, key), (nxt, prob)

    (caches, _, _), (toks, probs) = jax.lax.scan(
        body, (caches, t0, key), jnp.arange(g + 1)
    )
    return toks[:g], probs[:g], caches


@functools.partial(jax.jit, static_argnames=("cfg",))
def _peek_chunk(params, caches, tokens, cache_index, cfg):
    """decode_chunk WITHOUT cache donation: read-only logits probe (the
    caller keeps using its caches afterwards)."""
    return _decode_chunk_impl(params, caches, tokens, cache_index, cfg)


def _sync_draft(draft_params, caches_d, token, pos, cfg_d):
    """Append one token to the draft cache without sampling (fallback path
    when there is no room to speculate)."""
    _, caches_d = decode_chunk(
        draft_params, caches_d, jnp.asarray([[token]], jnp.int32),
        jnp.int32(pos), cfg_d,
    )
    return caches_d


def speculative_generate(
    target_params,
    draft_params,
    target_cfg: TransformerConfig,
    draft_cfg: TransformerConfig,
    prompt,
    *,
    max_new_tokens: int,
    gamma: int = 4,
    sampling: SamplingConfig | None = None,
    key: jax.Array | None = None,
) -> tuple[list[int], SpecStats]:
    """Generate ``max_new_tokens`` continuations of ``prompt`` (list[int]).

    Greedy (sampling None / temperature 0) reproduces the target model's
    greedy continuation exactly; stochastic preserves the target's filtered
    sampling distribution via rejection sampling.
    """
    if target_cfg.vocab_size != draft_cfg.vocab_size:
        raise ValueError("target and draft must share a vocabulary")
    if gamma < 1:
        raise ValueError(f"gamma must be >= 1, got {gamma}")
    stochastic = sampling is not None and not sampling.greedy
    if stochastic and key is None:
        raise ValueError("stochastic speculative decoding needs a PRNG key")
    if key is None:
        key = jax.random.key(0)  # drives nothing in greedy mode

    seq = [int(t) for t in prompt]
    if not seq:
        raise ValueError("prompt must be non-empty")
    max_len = min(target_cfg.max_seq_len, draft_cfg.max_seq_len)
    if len(seq) > max_len:
        raise ValueError(f"prompt length {len(seq)} exceeds max_len {max_len}")
    caches_t = init_kv_cache(target_cfg, 1, max_len)
    caches_d = init_kv_cache(draft_cfg, 1, max_len)

    # Prefill both caches with seq[:-1]; each round re-feeds seq[-1] as the
    # first chunk row so its logits row verifies the first draft token.
    if len(seq) > 1:
        pre = jnp.asarray([seq[:-1]], jnp.int32)
        _, caches_t = decode_chunk(
            target_params, caches_t, pre, jnp.int32(0), target_cfg
        )
        _, caches_d = decode_chunk(
            draft_params, caches_d, pre, jnp.int32(0), draft_cfg
        )

    out: list[int] = []
    stats = SpecStats()

    while len(out) < max_new_tokens:
        m = len(seq)
        # Chunk needs rows m-1 .. m+g-1; the draft scan writes one further.
        g = min(gamma, max_new_tokens - len(out), max_len - m - 1)
        if g < 1:
            # No head-room to speculate (sequence near max_len or one token
            # left): plain target decode for the remainder.
            logits, caches_t = decode_chunk(
                target_params, caches_t,
                jnp.asarray([[seq[-1]]], jnp.int32), jnp.int32(m - 1),
                target_cfg,
            )
            row = logits[0, -1]
            if stochastic:
                key, sub = jax.random.split(key)
                filt = filter_logits(row, sampling)
                tok = int(jax.random.categorical(sub, filt))
            else:
                tok = int(jnp.argmax(row))
            caches_d = _sync_draft(draft_params, caches_d, seq[-1], m - 1,
                                   draft_cfg)
            out.append(tok)
            seq.append(tok)
            stats.rounds += 1
            stats.emitted += 1
            if len(seq) > max_len:  # next feed position would be max_len
                break
            continue

        key, k_prop, k_acc = jax.random.split(key, 3)
        d_toks, d_probs, caches_d = _propose(
            draft_params, caches_d, jnp.int32(seq[-1]), jnp.int32(m - 1),
            k_prop, g=g, cfg=draft_cfg, sampling=sampling,
        )
        d_toks_np = np.asarray(d_toks)

        chunk = jnp.asarray([[seq[-1], *d_toks_np.tolist()]], jnp.int32)
        logits, caches_t = decode_chunk(
            target_params, caches_t, chunk, jnp.int32(m - 1), target_cfg
        )  # (1, g+1, V); row j = dist for position m+j

        if not stochastic:
            t_hat = np.asarray(jnp.argmax(logits[0], axis=-1))  # (g+1,)
            a = 0
            while a < g and t_hat[a] == d_toks_np[a]:
                a += 1
            emitted = list(d_toks_np[:a])
            emitted.append(int(t_hat[a]))  # correction (a<g) or bonus (a==g)
        else:
            p_t = np.asarray(jax.nn.softmax(
                filter_logits(logits[0], sampling), axis=-1
            ))  # (g+1, V)
            p_d = np.asarray(d_probs)
            us = np.asarray(jax.random.uniform(k_acc, (g,)))
            a = 0
            while a < g:
                pt = p_t[a, d_toks_np[a]]
                if us[a] < min(1.0, pt / max(float(p_d[a]), 1e-30)):
                    a += 1
                else:
                    break
            emitted = list(d_toks_np[:a])
            key, sub = jax.random.split(key)
            if a == g:  # all accepted: bonus from the target's last row
                emitted.append(int(jax.random.categorical(
                    sub, jnp.log(jnp.clip(jnp.asarray(p_t[g]), 1e-30))
                )))
            else:
                # Residual distribution: the draft's full filtered dist at
                # the rejected position (one extra draft pass would be
                # needed to know it exactly — instead reconstruct from the
                # target row and the single known draft prob is NOT enough,
                # so re-run the draft row). See _residual below.
                res = _residual(
                    draft_params, caches_d, seq, emitted, a, p_t[a],
                    draft_cfg, sampling,
                )
                emitted.append(int(jax.random.categorical(
                    sub, jnp.log(jnp.clip(jnp.asarray(res), 1e-30))
                )))

        emitted = [int(t) for t in emitted]
        out.extend(emitted)
        seq.extend(emitted)
        stats.rounds += 1
        stats.proposed += g
        stats.accepted += a
        stats.emitted += len(emitted)

    return out[:max_new_tokens], stats


def _residual(draft_params, caches_d, seq, emitted, a, p_t_row, cfg_d,
              sampling):
    """max(p_t - p_d, 0) normalized at the first rejected position.

    The draft's filtered distribution at that position is recomputed with a
    cache-free read: the draft cache already contains every token before it
    (the propose scan wrote through the full chunk), so one 1-token forward
    with a NON-donated cache copy yields p_d's full row. Falls back to p_t
    when the residual has no mass (draft == target row)."""
    pos = len(seq) - 1 + a  # absolute position of the rejected token
    # Token preceding the rejected position = chunk row a's input.
    chain = [seq[-1], *emitted]
    prev = int(chain[a])
    logits, _ = _peek_chunk(
        draft_params, caches_d,
        jnp.asarray([[prev]], jnp.int32), jnp.int32(pos), cfg_d,
    )
    p_d_row = np.asarray(jax.nn.softmax(filter_logits(logits[0, -1], sampling)))
    res = np.clip(np.asarray(p_t_row) - p_d_row, 0.0, None)
    s = res.sum()
    if s <= 0:
        return np.asarray(p_t_row)
    return res / s


def generate(
    params,
    cfg: TransformerConfig,
    prompt,
    *,
    max_new_tokens: int,
    sampling: SamplingConfig | None = None,
    key: jax.Array | None = None,
) -> list[int]:
    """Plain autoregressive baseline on the same decode path (one target
    pass per token) — the reference output for the speculative tests and a
    convenience API."""
    stochastic = sampling is not None and not sampling.greedy
    if stochastic and key is None:
        raise ValueError("stochastic generation needs a PRNG key")
    seq = [int(t) for t in prompt]
    caches = init_kv_cache(cfg, 1, cfg.max_seq_len)
    if len(seq) > 1:
        _, caches = decode_chunk(
            params, caches, jnp.asarray([seq[:-1]], jnp.int32), jnp.int32(0),
            cfg,
        )
    out: list[int] = []
    # len(seq) == max_seq_len is still decodable: feeding seq[-1] writes the
    # last cache slot and yields the distribution for position max_seq_len
    # (the token itself can't be fed back). Matches speculative_generate's
    # no-headroom fallback.
    while len(out) < max_new_tokens and len(seq) <= cfg.max_seq_len:
        logits, caches = decode_chunk(
            params, caches, jnp.asarray([[seq[-1]]], jnp.int32),
            jnp.int32(len(seq) - 1), cfg,
        )
        row = logits[0, -1]
        if stochastic:
            key, sub = jax.random.split(key)
            tok = int(jax.random.categorical(sub, filter_logits(row, sampling)))
        else:
            tok = int(jnp.argmax(row))
        out.append(tok)
        seq.append(tok)
    return out
