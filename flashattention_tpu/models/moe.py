"""Mixture-of-Experts MLP with expert parallelism (GShard/Switch style).

TPU-native formulation: routing is expressed as ONE-HOT DISPATCH EINSUMS
(the GShard recipe) — static shapes, no gather/scatter, every FLOP lands
on the MXU, and sharding the stacked expert weights over the mesh
'model' axis turns the dispatch/combine einsums into GSPMD-inserted
all-to-alls (expert parallelism without hand-written collectives).

Per MoE layer the params are::

    {"router": (D, E),
     "w_in": (E, D, F), "b_in": (E, F),
     "w_out": (E, F, D), "b_out": (E, D)}

Routing semantics (top-k, capacity-factored):
- router logits are computed in fp32 (standard practice — bf16 router
  logits make top-k selection noisy),
- each token picks its top-k experts; gate weights are the renormalized
  softmax mass of the chosen experts,
- each expert accepts at most C = ceil(N * k * cf / E) tokens per batch row,
  filled in choice-major order (all first choices before any second
  choice, GShard §3.2); overflowing assignments are DROPPED — the token's
  residual stream simply skips the MLP for that choice,
- the load-balance aux loss is Switch-style: E * sum_e f_e * P_e with
  f_e the fraction of tokens whose FIRST choice is e and P_e the mean
  router probability of e (== 1.0 at perfectly uniform routing).

The dense-equivalence oracle used by the tests: when all E experts hold
IDENTICAL weights and capacity is ample, the combine step reduces to
sum_k gate_k * FFN(x) = FFN(x) — the MoE layer must equal the dense MLP
bit-for-class.

The reference repo has no MoE (single dense-MLP model family,
flashattention_pytorch.py ln 560-618); this is north-star scope
completing the parallelism matrix (dp/tp/sp/pp/ep).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def moe_mlp(x: jax.Array, p: dict, cfg, *,
            dropless: bool = False) -> tuple[jax.Array, jax.Array]:
    """(B, N, D) -> ((B, N, D), aux_loss scalar fp32).

    Tokens are routed per GROUP of ``cfg.moe_group_size`` consecutive
    tokens (GShard token grouping) so the dispatch/combine tensors stay
    LINEAR in sequence length — capacity is per (group, expert), and the
    one-hot tensors are O(B * N * k * E * C) with C fixed by the group
    size, not by N. When the configured group size doesn't divide N, the
    largest divisor of N that fits it is used instead (never one whole-N
    group — see the derivation at the `g =` line below).

    ``dropless=True`` (inference paths: eval forward, KV-cache decode,
    serving engine): capacity = group size (top-k experts are distinct
    per token, so no expert can receive more than g assignments), so NO
    assignment is ever dropped. This makes inference (a) exact — output is the full gated
    mixture, (b) causal and group-invariant — a later token can never
    evict an earlier token's expert slot, so teacher-forced eval,
    chunked prefill and one-token decode all agree bit-for-class.
    Training keeps capacity drops (the EP-efficiency semantics the
    capacity factor exists for); capacity MoE training is inherently
    non-causal across a group, which is why inference must not share it.
    """
    b, n, d = x.shape
    e = cfg.moe_experts
    k = cfg.moe_top_k
    # Largest divisor of n that fits the configured group size (trace-time
    # Python; shapes are static). Never falls back to one whole-N group —
    # that would reintroduce the quadratic dispatch blowup grouping
    # exists to prevent. Dropless output is group-invariant, so any
    # divisor is exact; training capacity semantics are per-group.
    gs = min(getattr(cfg, "moe_group_size", 512), n)
    g = next(d_ for d_ in range(gs, 0, -1) if n % d_ == 0)
    if dropless:
        # top_k returns k DISTINCT experts per token, so one expert can
        # receive at most g assignments per group: cap = g (not g*k)
        # keeps droplessness while the expert einsums' slot dim stays
        # k-times smaller.
        cap = g
    else:
        cap = max(1, math.ceil(g * k * cfg.moe_capacity_factor / e))
    xg = x.reshape(b * n // g, g, d)
    bg = xg.shape[0]

    logits = xg.astype(jnp.float32) @ p["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                    # (BG, G, E)
    gate_vals, gate_idx = lax.top_k(probs, k)                  # (BG, G, k)
    gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)

    oh = jax.nn.one_hot(gate_idx, e, dtype=jnp.float32)        # (BG, G, k, E)
    # Choice-major fill order: all first choices claim capacity before any
    # second choice (GShard) — flatten (k, G) with k outermost.
    flat = jnp.swapaxes(oh, 1, 2).reshape(bg, k * g, e)
    pos = jnp.cumsum(flat, axis=1) - flat                      # slots used
    kept = flat * (pos < cap)
    # One-hot the capacity slot; dropped assignments contribute zero rows.
    slot = (jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=jnp.float32)
            * kept[..., None])
    slot = jnp.swapaxes(slot.reshape(bg, k, g, e, cap), 1, 2)  # (BG,G,k,E,C)

    dispatch = jnp.sum(slot, axis=2)                           # (BG, G, E, C)
    combine = jnp.sum(gate_vals[..., None, None] * slot, axis=2)

    cdt = x.dtype
    xin = jnp.einsum("bnec,bnd->ebcd", dispatch.astype(cdt), xg)
    h = jax.nn.gelu(
        jnp.einsum("ebcd,edf->ebcf", xin, p["w_in"].astype(cdt))
        + p["b_in"][:, None, None, :].astype(cdt)
    )
    yexp = (
        jnp.einsum("ebcf,efd->ebcd", h, p["w_out"].astype(cdt))
        + p["b_out"][:, None, None, :].astype(cdt)
    )
    y = jnp.einsum("bnec,ebcd->bnd", combine.astype(cdt), yexp)

    # Switch load-balance loss over first choices (means over all tokens).
    f = jnp.mean(oh[:, :, 0, :], axis=(0, 1))
    pm = jnp.mean(probs, axis=(0, 1))
    aux = e * jnp.sum(f * pm)
    return y.reshape(b, n, d), aux


def init_moe_mlp(key: jax.Array, cfg, out_scale: float) -> dict:
    """Stacked-expert MLP params (called from init_transformer)."""
    from flashattention_tpu.models.transformer import _dense_init

    d, f, e = cfg.d_model, cfg.d_ff, cfg.moe_experts
    pd = cfg.param_dtype
    ks = jax.random.split(key, 3)
    return {
        "router": _dense_init(ks[0], (d, e), pd),
        "w_in": _dense_init(ks[1], (e, d, f), pd),
        "b_in": jnp.zeros((e, f), pd),
        "w_out": _dense_init(ks[2], (e, f, d), pd, out_scale),
        "b_out": jnp.zeros((e, d), pd),
    }
