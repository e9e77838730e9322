"""Token sampling for the serving engine: temperature / top-k / top-p.

The reference has no generation loop at all (its application trains and
saves, src/fa3/torch/flashattention_pytorch.py:824-960); the serving stack
is new scope (BASELINE.json north star: continuous-batched decode). Greedy
argmax remains the engine default — this module adds the standard stochastic
decode controls as a pure, jit-compatible function.

Design notes (TPU):
- Everything is fixed-shape: top-k uses ``lax.top_k`` only to find the k-th
  value (a threshold), then masks in place — no gather/scatter of the vocab.
- top-p masks by *exclusive* cumulative probability of the descending sort,
  so the token that crosses the threshold is kept (at least one token always
  survives, any temperature).
- Filters compose the conventional way: temperature -> top-k -> top-p ->
  categorical over the renormalized remainder.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["SamplingConfig", "filter_logits", "sample_logits",
           "spec_accept_emit"]


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling hyper-parameters (close over them at jit time).

    temperature: 0.0 = greedy argmax (top_k/top_p ignored).
    top_k: keep the k highest-probability tokens (0 = no top-k filter).
    top_p: keep the smallest prefix of descending-probability tokens whose
        cumulative mass reaches top_p (1.0 = no nucleus filter).
    """

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0

    def __post_init__(self):
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


_NEG = jnp.float32(-1e30)  # filtered-out logit (finite: NaN-safe under jit)


def filter_logits(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Apply temperature / top-k / top-p to (..., V) logits; filtered-out
    entries go to a large negative. ``softmax`` of the result is the
    effective sampling distribution (used directly by speculative decoding's
    rejection test). Requires a stochastic cfg (temperature > 0)."""
    if cfg.greedy:
        raise ValueError("filter_logits needs temperature > 0")
    x = logits.astype(jnp.float32) / jnp.float32(cfg.temperature)
    v = x.shape[-1]
    if 0 < cfg.top_k < v:
        kth = jax.lax.top_k(x, cfg.top_k)[0][..., -1:]  # (..., 1) threshold
        x = jnp.where(x < kth, _NEG, x)
    if cfg.top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]  # descending
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive prefix mass
        # Smallest logit still inside the nucleus; everything below it is cut.
        in_nucleus = cum < cfg.top_p  # position 0 always True
        cutoff = jnp.min(
            jnp.where(in_nucleus, sorted_x, jnp.inf), axis=-1, keepdims=True
        )
        x = jnp.where(x < cutoff, _NEG, x)
    return x


def sample_logits(
    logits: jax.Array, key: jax.Array | None, cfg: SamplingConfig
) -> jax.Array:
    """(B, V) logits -> (B,) int32 tokens. ``key`` may be None when greedy."""
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("stochastic sampling needs a PRNG key")
    return jax.random.categorical(
        key, filter_logits(logits, cfg), axis=-1
    ).astype(jnp.int32)


def spec_accept_emit(
    p_dist: jax.Array,   # (B, g+1, V) target filtered probs per chunk row
    q_dist: jax.Array,   # (B, g, V)   draft filtered probs per proposal
    draft: jax.Array,    # (B, g)      proposed tokens
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Batched distribution-preserving speculative acceptance
    (Leviathan et al. 2023; single-sequence analogue:
    serving/speculative.py lines "accept d_j with prob min(1, p/q)").

    Per slot: accept draft token j while u_j < p(d_j)/q(d_j); at the
    first rejection sample the CORRECTION from the normalized residual
    max(p - q, 0) (falling back to p when the residual has no mass);
    when all g are accepted sample the BONUS from the target's row g.
    Every emitted token is marginally distributed as the target's
    filtered distribution — the property pinned by
    tests/test_sampling.py::test_spec_accept_emit_preserves_target.

    Returns (a (B,) int32 accepted counts, emit (B, g+1) int32) where
    emit[b, :a[b]] are the accepted draft tokens and emit[b, a[b]] is
    the correction/bonus; the engine emits emit[b, :a[b]+1].
    """
    b, g = draft.shape
    ku, kc = jax.random.split(key)
    p_tok = jnp.take_along_axis(
        p_dist[:, :g], draft[..., None], axis=-1)[..., 0]
    q_tok = jnp.take_along_axis(q_dist, draft[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(ku, (b, g))
    accept = u * jnp.maximum(q_tok, 1e-30) < p_tok
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    pa = jnp.take_along_axis(p_dist, a[:, None, None], axis=1)[:, 0]
    qa = jnp.take_along_axis(
        q_dist, jnp.minimum(a, g - 1)[:, None, None], axis=1)[:, 0]
    res = jnp.clip(pa - qa, 0.0, None)
    s = jnp.sum(res, axis=-1, keepdims=True)
    res = jnp.where(s > 0, res / jnp.maximum(s, 1e-30), pa)
    dist = jnp.where((a == g)[:, None], pa, res)  # a==g: pa IS the bonus row
    corr = jax.random.categorical(
        kc, jnp.log(jnp.clip(dist, 1e-30, None)), axis=-1)
    emit = jnp.concatenate(
        [draft, jnp.zeros((b, 1), draft.dtype)], axis=1)
    emit = emit.at[jnp.arange(b), a].set(corr.astype(draft.dtype))
    return a.astype(jnp.int32), emit
