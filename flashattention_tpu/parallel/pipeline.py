"""Pipeline parallelism: GPipe-style microbatched stages over a 'pipe' axis.

TPU-native formulation (single program, collective-matched — the
scaling-book pipelining recipe, NOT a torch.distributed send/recv
translation):

- The L transformer blocks are split into S = mesh.shape['pipe']
  contiguous stages; each stage's blocks are STACKED so every stage-leaf
  has leading shape (S, L/S, ...) sharded ``P('pipe')`` — one stage's
  weights per device, layers scanned on-device with ``lax.scan``.
- One ``shard_map`` region runs the classic GPipe schedule as a
  ``lax.scan`` over T = M + S - 1 ticks (M = microbatches): every tick
  each stage consumes the activation that arrived over ICI, runs its
  layers, and hands the result to the next stage with ``lax.ppermute``.
  Bubble ticks compute on don't-care data (single-program SPMD — control
  flow is identical on every device, which is what XLA wants) and their
  outputs are never read.
- Reverse-mode autodiff through ``ppermute`` reverses the permutation,
  so ``jax.grad`` of this forward IS the backward pipeline schedule —
  no hand-written 1F1B state machine, the AD transpose derives it.
- Embedding and the LM head run OUTSIDE the shard_map region (replicated
  over 'pipe', batch-sharded over 'data' by GSPMD). Production systems
  fold them into the first/last stage; at the scales this repo targets
  they are <2% of FLOPs and keeping them outside makes the pipeline
  region exactly "the block stack", which is what parity tests pin.
- Composes with data parallelism: microbatch rows are sharded over
  'data' inside the same shard_map (in_specs carry both axes).
  Tensor parallelism *within* a stage (nested 'model'-axis collectives
  inside a shard_map region) is intentionally out of scope here — use
  dp x tp (parallel/sharded.py) or dp x pp (this file); see PARITY.md.

Dropout inside the pipeline derives per-(microbatch, layer) keys by
``fold_in`` of a single base key — replayable and schedule-independent,
but a DIFFERENT stream than apply_transformer's sequential split, so
train-mode parity tests against the dense forward must use
dropout_rate=0 (inference parity is exact).

The reference repo is single-GPU (SURVEY §2.4: no distributed layer);
pipeline parallelism is north-star scope matching parallel/sharded.py
(dp/tp) and parallel/ring.py (sp/cp).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models.transformer import (
    TransformerConfig,
    _block,
    _dropout,
    _layer_norm,
    lm_head_logits,
)

Params = dict


# ---------------------------------------------------------------------------
# Parameter stacking: list-of-blocks  <->  (S, L/S, ...) stage leaves
# ---------------------------------------------------------------------------


def stack_pipeline_params(params: Params, n_stages: int) -> Params:
    """Regroup a standard transformer param dict for an S-stage pipeline.

    Returns ``{"embed": {...}, "stages": {...}, "head": {...}}`` where
    every leaf of ``stages`` is the corresponding block leaf stacked to
    (S, L/S, *leaf.shape) — ready to shard ``P('pipe')`` on axis 0 and
    ``lax.scan`` over axis 1 on-device.
    """
    blocks = params["blocks"]
    n_layers = len(blocks)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers={n_layers} not divisible by n_stages={n_stages}"
        )
    lps = n_layers // n_stages
    stages = jax.tree.map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (n_stages, lps) + leaves[0].shape
        ),
        *blocks,
    )
    embed = {"tok_emb": params["tok_emb"]}
    if "pos_emb" in params:
        embed["pos_emb"] = params["pos_emb"]
    head = {"final_ln": params["final_ln"], "lm_head": params["lm_head"]}
    return {"embed": embed, "stages": stages, "head": head}


def unstack_pipeline_params(pp: Params) -> Params:
    """Inverse of :func:`stack_pipeline_params` (checkpoint/eval interop)."""
    stages = pp["stages"]
    lead = jax.tree.leaves(stages)[0].shape
    n_stages, lps = lead[0], lead[1]
    blocks = [
        jax.tree.map(lambda a, s=s, j=j: a[s, j], stages)
        for s in range(n_stages)
        for j in range(lps)
    ]
    params = {"tok_emb": pp["embed"]["tok_emb"], "blocks": blocks,
              "final_ln": pp["head"]["final_ln"],
              "lm_head": pp["head"]["lm_head"]}
    if "pos_emb" in pp["embed"]:
        params["pos_emb"] = pp["embed"]["pos_emb"]
    return params


def pipeline_partition_specs(pp: Params) -> Params:
    """PartitionSpecs: stage leaves P('pipe'), embed/head replicated."""
    return {
        "embed": jax.tree.map(lambda _: P(), pp["embed"]),
        "stages": jax.tree.map(lambda _: P("pipe"), pp["stages"]),
        "head": jax.tree.map(lambda _: P(), pp["head"]),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def make_pipeline_forward(
    mesh: Mesh,
    cfg: TransformerConfig,
    n_micro: int,
    *,
    train: bool = False,
):
    """Build ``fn(pp_params, tokens, dropout_key=None) -> logits``.

    ``tokens`` (B, N) with B % n_micro == 0 and (B / n_micro) divisible by
    mesh.shape['data'].  Inference output is bitwise the dense
    ``apply_transformer`` math (same block code, same scan order within a
    stage); train mode differs only in dropout key derivation.
    """
    if "pipe" not in mesh.shape:
        raise ValueError("mesh has no 'pipe' axis — make_mesh(pipe=S)")
    n_stages = mesh.shape["pipe"]
    n_data = mesh.shape.get("data", 1)
    use_dropout = train and cfg.dropout_rate > 0

    def stage_apply(blocks, x, base_key, stage, micro):
        """Run this stage's L/S blocks (scanned) on one microbatch.
        Returns (x, aux): summed MoE load-balance aux of this stage's
        layers on this microbatch (0 for dense blocks)."""
        lps = jax.tree.leaves(blocks)[0].shape[0]

        def body(x, sl):
            bp, j = sl
            if use_dropout:
                gl = stage * lps + j  # global layer index
                kj = jax.random.fold_in(
                    jax.random.fold_in(base_key, micro), gl
                )
                keys = tuple(jax.random.fold_in(kj, i) for i in range(3))
            else:
                keys = (None, None, None)
            x, aux = _block(x, bp, cfg, keys=keys, train=train,
                            sparse_mask=None)
            return x, aux

        if cfg.remat:
            if cfg.remat_policy == "dots":
                policy = (
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                )
            elif cfg.remat_policy == "full":
                policy = None
            else:  # same contract as apply_transformer — never silent
                raise ValueError(
                    f"remat_policy must be 'full' or 'dots', "
                    f"got {cfg.remat_policy!r}"
                )
            body = jax.checkpoint(body, policy=policy)
        x, auxs = lax.scan(body, x, (blocks, jnp.arange(lps)))
        return x, jnp.sum(auxs)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("pipe"), P(None, "data"), P()),
        out_specs=(P("pipe", None, "data"), P()),
        check_vma=False,
    )
    def pipeline_region(stages, x_micro, base_key):
        # stages: leaves (1, L/S, ...); x_micro: (M, Bm/n_data, N, D)
        blocks = jax.tree.map(lambda a: a[0], stages)
        s = lax.axis_index("pipe")
        m_total = x_micro.shape[0]
        ticks = m_total + n_stages - 1

        def tick(act, t):
            m_in = jnp.clip(t - s, 0, m_total - 1)  # this stage's micro idx
            inp = jnp.where(
                s == 0,
                lax.dynamic_index_in_dim(x_micro, m_in, 0, keepdims=False),
                act,
            )
            out, aux = stage_apply(blocks, inp, base_key, s, m_in)
            # Bubble ticks recompute a clamped duplicate microbatch —
            # mask their aux so each (stage, micro) pair counts once.
            valid = ((t - s >= 0) & (t - s < m_total)).astype(jnp.float32)
            nxt = lax.ppermute(
                out, "pipe",
                [(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
            return nxt, (out, aux * valid)

        act0 = jnp.zeros_like(x_micro[0])
        _, (outs, auxs) = lax.scan(tick, act0, jnp.arange(ticks))
        # Aux: per-microbatch means summed over ticks -> divide by M,
        # a per-microbatch ESTIMATOR of the dense forward's full-batch
        # per-layer aux (Switch f_e*P_e is nonlinear in the batch, so
        # averaging per-micro statistics equals the full-batch statistic
        # only as M->1; the estimator is unbiased in expectation and is
        # the standard microbatched-MoE choice). psum over 'pipe' totals
        # the stages' layers, pmean over 'data' averages the batch
        # shards. Fully replicated afterwards (out_specs P()).
        aux = jnp.sum(auxs) / m_total
        aux = lax.pmean(lax.psum(aux, "pipe"), "data")
        # The last stage emits microbatch m at tick m + S - 1: a STATIC
        # slice of the scan stack. Other stages' rows are bubble garbage;
        # the caller indexes stage S-1 of the stacked out_specs axis.
        return outs[n_stages - 1:][None], aux  # (1, M, Bm, N, D), scalar

    def forward(pp, tokens, dropout_key=None, *, return_hidden=False,
                return_aux=False):
        b, n = tokens.shape
        if b % n_micro != 0:
            raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
        bm = b // n_micro
        if bm % n_data != 0:
            raise ValueError(
                f"microbatch rows {bm} not divisible by data axis {n_data}"
            )
        x = pp["embed"]["tok_emb"][tokens].astype(cfg.dtype)
        x = x * math.sqrt(cfg.d_model)
        if cfg.pos_encoding == "learned":
            x = x + pp["embed"]["pos_emb"][:n].astype(cfg.dtype)
        if dropout_key is None:
            dropout_key = jax.random.key(0)
        if use_dropout:
            # Embedding dropout, same as the dense forward applies before
            # the block stack (fresh subkey so layer keys don't collide).
            dropout_key, ekey = jax.random.split(dropout_key)
            x = _dropout(x, ekey, cfg.dropout_rate)
        x = x.reshape(n_micro, bm, n, x.shape[-1])
        h, aux = pipeline_region(pp["stages"], x, dropout_key)
        h = h[n_stages - 1].reshape(b, n, -1)  # last stage's stream
        h = _layer_norm(h, pp["head"]["final_ln"])
        out = h if return_hidden else lm_head_logits(pp["head"]["lm_head"], h)
        return (out, aux) if return_aux else out

    return forward


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def make_pipelined_train_state(mesh: Mesh, params: Params, tx):
    """Stack + place params for the pipeline and init optimizer state with
    matching shardings (stage moments live with their stage)."""
    n_stages = mesh.shape["pipe"]
    pp = stack_pipeline_params(params, n_stages)
    specs = pipeline_partition_specs(pp)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    # Copy before placing: stage leaves are fresh stacks, but embed/head
    # leaves ALIAS the caller's params — without the copy the donating
    # train step (donate_argnums=(0,)) would delete the caller's arrays
    # on the first step.
    pp = jax.device_put(jax.tree.map(jnp.copy, pp), shardings)
    opt_state = jax.jit(tx.init)(pp)
    return pp, opt_state, specs


def make_pipelined_train_step(mesh: Mesh, cfg: TransformerConfig, tx,
                              n_micro: int):
    """jit a dp x pp train step: next-token CE over the pipelined forward.

    Gradients flow back through ppermute's AD transpose (the backward
    pipeline); optimizer update is elementwise so stage shardings are
    preserved. Packed-varlen/segment batches are a dense-path feature
    (models/train.py loss_fn) — this step takes plain (B, N+1) tokens.
    """
    fwd = make_pipeline_forward(mesh, cfg, n_micro, train=True)
    moe = cfg.moe_experts > 0

    def pp_loss(pp, batch, key):
        tokens = batch["tokens"]
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        logits, aux = fwd(pp, inputs, key, return_aux=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        ce = jnp.mean(nll)
        return ce + cfg.moe_aux_coef * aux if moe else ce

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(pp, opt_state, batch, step_key):
        import optax

        loss, grads = jax.value_and_grad(pp_loss)(pp, batch, step_key)
        updates, opt_state = tx.update(grads, opt_state, pp)
        pp = optax.apply_updates(pp, updates)
        pp = jax.lax.with_sharding_constraint(
            pp,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s), pipeline_partition_specs(pp)
            ),
        )
        return pp, opt_state, loss

    return step
