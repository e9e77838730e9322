"""Training loop for the decoder LM.

TPU-native re-design of the reference's training entry point
(src/fa3/torch/flashattention_pytorch.py:714-963):

- AdamW lr 1e-4, betas (0.9, 0.95), warmup 1000 steps + cosine decay,
  grad-clip 1.0 (reference FlashAttentionConfig ln 692-704) via optax.
- Gradient accumulation (reference grad-accum 16, ln 706) via
  optax.MultiSteps.
- Mixed precision the TPU way: bf16 activations/compute, fp32 params and
  optimizer state — no GradScaler needed (bf16 has fp32's exponent range;
  the reference's AMP+GradScaler machinery, ln 896-914, is CUDA-specific).
- Checkpoint save AND resume (the reference only saves, ln 950 — no load
  path; SURVEY.md §5.4) via orbax.

Run ``python -m flashattention_tpu.models.train --smoke`` for a tiny
end-to-end run (synthetic data; works on CPU).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flashattention_tpu.models.transformer import (
    TransformerConfig,
    apply_transformer,
    init_transformer,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference training hyperparameters (flashattention_pytorch.py:692-711)."""

    learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.1
    warmup_steps: int = 1000
    total_steps: int = 10000
    grad_clip: float = 1.0
    grad_accum: int = 16
    batch_size: int = 8
    seq_len: int = 512
    seed: int = 0
    log_every: int = 10
    checkpoint_every: int = 1000
    checkpoint_dir: str | None = None


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    # UNIT ALIGNMENT (review r5): warmup_steps/total_steps count
    # MICRO-batches (the train loop's `step`), but under MultiSteps the
    # inner adamw's schedule count advances once per grad_accum micros —
    # feeding the micro-batch numbers straight in stretched the schedule
    # by grad_accum x (the default run finished all 10000 micros still
    # INSIDE warmup at lr ~learning_rate/1.6, never reaching peak or
    # decay). Convert to optimizer-update units here so warmup completes
    # at ~warmup_steps micros and decay ends at total_steps micros.
    accum = max(1, tc.grad_accum)
    warmup_updates = max(1, tc.warmup_steps // accum)
    # decay_steps is the TOTAL schedule length including warmup; optax
    # requires the cosine tail (decay - warmup) to be positive.
    decay_updates = max(warmup_updates + 1, tc.total_steps // accum)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=warmup_updates,
        decay_steps=decay_updates,
        end_value=tc.learning_rate * 0.1,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(
            schedule, b1=tc.beta1, b2=tc.beta2, weight_decay=tc.weight_decay
        ),
    )
    if tc.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.grad_accum)
    return tx


def chunked_cross_entropy(x, lm_head, targets, chunk, valid=None):
    """Mean next-token CE with per-chunk logits: a remat'd lax.scan
    computes (B, chunk, V) logits per step, so peak logits memory drops
    from O(B*N*V) to O(B*chunk*V) — at GPT-2 vocab and B=8, N=1024 that
    is 1.6 GB -> 1.6/(N/chunk) GB. The backward recomputes each chunk's
    logits from the checkpointed inputs (FLOPs-for-HBM, the same trade
    as attention recompute). ``valid`` masks targets (packed varlen)."""
    b, n, d = x.shape
    if valid is None:
        valid = jnp.ones((b, n), bool)
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    steps = x.shape[1] // chunk
    xs = jnp.moveaxis(x.reshape(b, steps, chunk, d), 1, 0)
    ts = jnp.moveaxis(targets.reshape(b, steps, chunk), 1, 0)
    vs = jnp.moveaxis(valid.reshape(b, steps, chunk), 1, 0)
    w = lm_head["w"]
    bias = lm_head["b"]

    @jax.checkpoint
    def one(xc, tc, vc):
        logits = (
            xc.astype(jnp.float32) @ w.astype(jnp.float32)
            + bias.astype(jnp.float32)
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(vc, nll, 0.0)), jnp.sum(vc)

    def body(carry, inp):
        s_, c_ = one(*inp)
        return (carry[0] + s_, carry[1] + c_), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (xs, ts, vs)
    )
    return total / jnp.maximum(count, 1)


def loss_fn(params, batch, cfg: TransformerConfig, dropout_key):
    """Next-token cross entropy (reference CE loss, ln 896-899).

    ``batch["segment_ids"]`` (optional, (B, N+1) int32): packed-varlen rows.
    Attention and positions stay within each segment (apply_transformer),
    and targets that cross a segment boundary — or live in a padding
    segment (id < 0) — are dropped from the mean.
    """
    tokens = batch["tokens"]  # (B, N+1)
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    seg = batch.get("segment_ids")
    valid = None
    if seg is not None:
        valid = (seg[:, :-1] == seg[:, 1:]) & (seg[:, :-1] >= 0)
    moe = cfg.moe_experts > 0
    if cfg.loss_chunk:
        x = apply_transformer(
            params, inputs, cfg, train=True, dropout_key=dropout_key,
            segment_ids=None if seg is None else seg[:, :-1],
            return_hidden=True, return_aux=moe,
        )
        x, aux = x if moe else (x, 0.0)
        ce = chunked_cross_entropy(
            x, params["lm_head"], targets, cfg.loss_chunk, valid=valid
        )
        return ce + cfg.moe_aux_coef * aux if moe else ce
    logits = apply_transformer(
        params, inputs, cfg, train=True, dropout_key=dropout_key,
        segment_ids=None if seg is None else seg[:, :-1],
        return_aux=moe,
    )
    logits, aux = logits if moe else (logits, 0.0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if seg is None:
        ce = jnp.mean(nll)
    else:
        ce = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1
        )
    return ce + cfg.moe_aux_coef * aux if moe else ce


@functools.partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnums=(0, 1))
def train_step(params, opt_state, batch, step_key, cfg: TransformerConfig, tx):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, cfg, step_key)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def save_checkpoint(path: str, step: int, params, opt_state) -> None:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(path) as mgr:
        mgr.save(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )


def restore_checkpoint(path: str, params_like, opt_state_like):
    """Resume path the reference never had (SURVEY.md §5.4)."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(params_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return step, restored.params, restored.opt_state


def synthetic_batches(tc: TrainConfig, vocab: int, n_batches: int):
    """Deterministic token-stream batches (stand-in for the reference's
    OpenWebText tokenize-once stream, ln 735-782; real data loads via
    flashattention_tpu.data when a corpus is available)."""
    rng = np.random.default_rng(tc.seed)
    stream = rng.integers(0, vocab, size=(n_batches, tc.batch_size, tc.seq_len + 1))
    for i in range(n_batches):
        yield {"tokens": jnp.asarray(stream[i], jnp.int32)}


def train(
    cfg: TransformerConfig,
    tc: TrainConfig,
    batches=None,
    *,
    verbose: bool = True,
):
    key = jax.random.key(tc.seed)
    pkey, dkey = jax.random.split(key)
    params = init_transformer(pkey, cfg)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)

    start_step = 0
    if tc.checkpoint_dir:
        restored = restore_checkpoint(tc.checkpoint_dir, params, opt_state)
        if restored is not None:
            start_step, params, opt_state = restored
            if verbose:
                print(f"resumed from step {start_step}")

    if batches is None:
        batches = synthetic_batches(tc, cfg.vocab_size, tc.total_steps)

    batches = iter(batches)
    if start_step:
        # Resume semantics: the stream must advance past the batches the
        # checkpointed run already consumed (steps 0..start_step inclusive —
        # the checkpoint is written AFTER its step), or the run re-trains
        # the head of the stream and never sees the tail.
        for _ in range(start_step + 1):
            next(batches, None)
        start_step += 1

    losses = []
    t0 = time.perf_counter()
    for step, batch in enumerate(batches, start=start_step):
        if step >= tc.total_steps:
            break
        step_key = jax.random.fold_in(dkey, step)
        params, opt_state, loss = train_step(
            params, opt_state, batch, step_key, cfg, tx
        )
        if step % tc.log_every == 0:
            loss_val = float(loss)
            losses.append(loss_val)
            if verbose:
                dt = time.perf_counter() - t0
                tok_s = (
                    tc.batch_size * tc.seq_len * tc.log_every / dt
                    if step else 0.0
                )
                print(
                    f"step {step:6d} loss {loss_val:8.4f} "
                    f"tokens/s {tok_s:10.0f}"
                )
                t0 = time.perf_counter()
        if tc.checkpoint_dir and step and step % tc.checkpoint_every == 0:
            save_checkpoint(tc.checkpoint_dir, step, params, opt_state)
    return params, opt_state, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model, 8 steps, synthetic data")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--checkpoint-dir", type=str, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (leave the TPU alone)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.smoke:
        cfg = TransformerConfig(
            vocab_size=512, d_model=128, n_layers=2, n_heads=4, d_ff=256,
            max_seq_len=128, block_size=128,
        )
        tc = TrainConfig(
            batch_size=2, seq_len=64, total_steps=8, grad_accum=2,
            warmup_steps=2, log_every=1, checkpoint_dir=args.checkpoint_dir,
        )
    else:
        cfg = TransformerConfig()
        tc = TrainConfig(
            total_steps=args.steps, checkpoint_dir=args.checkpoint_dir
        )
    _, _, losses = train(cfg, tc)
    print(f"final loss {losses[-1]:.4f}")


if __name__ == "__main__":
    main()
