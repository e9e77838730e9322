"""Tensor/data-parallel sharding: head-parallel attention and dp x tp training.

The training path is idiomatic pjit/GSPMD: annotate parameter and batch
shardings, jit the same single-device ``train_step``, and let XLA insert the
ICI collectives (scaling-book recipe). The attention path also ships an
explicit ``shard_map`` wrapper (heads on the 'model' axis — the pattern in
SNIPPETS.md §1) for kernels that must see only their local shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.ops.api import flash_attention


# ---------------------------------------------------------------------------
# Head-parallel attention (shard_map)
# ---------------------------------------------------------------------------


def head_sharded_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    softmax_scale: float | None = None,
    backend: str = "auto",
):
    """Attention with heads sharded over the 'model' axis and batch over
    'data' — zero communication during attention itself (heads are
    independent); the caller's output projection does the psum."""
    spec = P("data", "model", None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P("data", "model", None)),
        check_vma=False,  # lax.scan carries inside the kernel (cf. SNIPPETS
        # §1 check_rep=False — the standard pattern for wrapped kernels)
    )
    def _attn(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, softmax_scale=softmax_scale,
            backend=backend,
        )

    return _attn


# ---------------------------------------------------------------------------
# Parameter partition specs (tensor parallelism over 'model')
# ---------------------------------------------------------------------------


def param_partition_specs(params) -> dict:
    """PartitionSpec pytree for the transformer params (Megatron-style TP):

    - w_qkv: output dim sharded  -> heads land sharded on 'model'
    - w_o:   input dim sharded   -> psum after the output projection
    - mlp w_in / w_out: hidden dim sharded (column- then row-parallel)
    - embeddings / norms / biases that feed sharded matmuls: replicated
      (biases on sharded outputs are sharded)
    - lm_head: vocab dim sharded -> logits sharded over vocab
    """

    def spec_for(path: tuple, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        last = names[-1]
        # MoE expert leaves carry a leading expert dim (models/moe.py):
        # shard EXPERTS over 'model' (expert parallelism — the dispatch/
        # combine einsums become GSPMD all-to-alls); router replicated.
        if last == "router":
            return P()
        if last in ("w_in", "w_out") and leaf.ndim == 3:
            return P("model", None, None)
        if last in ("b_in", "b_out") and leaf.ndim == 2:
            return P("model", None)
        if last == "w_qkv":
            return P(None, "model")
        if last == "b_qkv":
            return P("model")
        if last == "w_o":
            return P("model", None)
        if last == "w_in":
            return P(None, "model")
        if last == "b_in":
            return P("model")
        if last == "w_out":
            return P("model", None)
        if "lm_head" in names and last == "w":
            return P(None, "model")
        if "lm_head" in names and last == "b":
            return P("model")
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _zero1_spec(p_spec: P, shape: tuple, n_data: int) -> P:
    """The ZeRO-1 sharding for an optimizer-moment leaf: the param's TP
    spec plus 'data' on the first free, divisible axis. Leaves with no
    such axis stay at the TP spec (tiny biases/norms — replicating their
    moments costs nothing)."""
    parts = list(p_spec) + [None] * (len(shape) - len(p_spec))
    for i, ax in enumerate(parts):
        if ax is None and shape[i] % n_data == 0 and shape[i] >= n_data:
            parts[i] = "data"
            break
    return P(*parts)


def make_sharded_train_state(mesh: Mesh, params, tx, *, zero1: bool = False):
    """Place params per TP spec (replicated over 'data') and init the
    optimizer under jit so its state inherits the same shardings.

    ``zero1=True`` additionally shards the optimizer moments over the
    'data' axis (ZeRO-1 / scaling-book optimizer-state sharding): each
    data-parallel rank holds 1/n_data of every AdamW mu/nu leaf, cutting
    optimizer memory by the DP degree. GSPMD inserts the reduce-scatter
    (grads -> sharded update) and all-gather (updates -> replicated
    params) that the explicit-collective formulation would hand-write.
    """
    specs = param_partition_specs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    # Copy before placing: on shardings that keep a leaf whole (or on CPU
    # meshes) device_put can alias the caller's buffers, and the donating
    # train step would then delete the caller's params on the first step.
    params = jax.device_put(jax.tree.map(jnp.copy, params), shardings)
    if not zero1:
        opt_state = jax.jit(tx.init)(params)
        return params, opt_state, specs
    import optax

    n_data = mesh.shape["data"]
    opt_shapes = jax.eval_shape(tx.init, params)
    opt_shardings = optax.tree_map_params(
        tx,
        lambda leaf, spec: NamedSharding(
            mesh, _zero1_spec(spec, leaf.shape, n_data)
        ),
        opt_shapes,
        specs,
        transform_non_params=lambda leaf: NamedSharding(mesh, P()),
    )
    opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
    return params, opt_state, specs


def make_sharded_train_step(mesh: Mesh, cfg, tx, loss_fn):
    """jit a dp x tp train step: batch sharded on 'data', params per TP spec.
    XLA/GSPMD inserts the psums (grad all-reduce over 'data', activation
    collectives over 'model')."""
    batch_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, step_key):
        # Every batch leaf is batch-leading — tokens AND the optional
        # packed-varlen segment_ids (loss_fn's contract) — so shard them
        # all on 'data'. The constraint pytree must match the batch
        # structure exactly; a tokens-only dict crashed packed batches
        # and left segment_ids unsharded (review r5).
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: batch_sharding, batch)
        )
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch, cfg, step_key
        )
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Pin params back to the TP spec: under ZeRO-1 the updates come out
        # data-sharded (they inherit the moments' sharding), and without
        # the constraint GSPMD would happily leave params data-sharded too
        # (all-gathering them anew inside every later matmul).
        params = jax.lax.with_sharding_constraint(
            params,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                param_partition_specs(params),
            ),
        )
        return params, opt_state, loss

    return step
