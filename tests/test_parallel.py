"""Sharding tests on the 8-virtual-device CPU mesh: outputs must match the
single-device reference (the cross-host parity suite SURVEY.md §4.4 calls
for) — sharded vs unsharded is a tolerance check, not a trust-me."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattention_tpu.models.train import TrainConfig, loss_fn, make_optimizer
from flashattention_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
)
from flashattention_tpu.ops.reference import reference_attention
from flashattention_tpu.parallel import (
    head_sharded_attention,
    make_mesh,
    make_sharded_train_state,
    make_sharded_train_step,
    param_partition_specs,
)
from flashattention_tpu.parallel.ring import make_ring_attention
from flashattention_tpu.utils.testing import assert_allclose, make_qkv


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "pipe": 1, "model": 4, "context": 1}
    with pytest.raises(ValueError):
        make_mesh(data=16, model=4)


def test_head_sharded_attention_matches_oracle():
    mesh = make_mesh(data=2, model=4)
    q, k, v = make_qkv(2, 8, 64, 32)  # batch 2 over data, 8 heads over model
    attn = head_sharded_attention(mesh, causal=True)
    o, lse = jax.jit(attn)(q, k, v)
    o_ref, lse_ref = reference_attention(q, k, v, causal=True)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_oracle(causal):
    mesh = make_mesh(data=2, model=1, context=4)
    q, k, v = make_qkv(2, 2, 128, 32)  # seq 128 -> 32 per context shard
    ring = make_ring_attention(mesh, causal=causal)
    o, lse = jax.jit(ring)(q, k, v)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


def test_sharded_train_step_matches_single_device():
    """dp x tp train step == single-device train step (grad + update parity)."""
    cfg = TransformerConfig(
        vocab_size=64, d_model=64, n_layers=1, n_heads=4, d_ff=64,
        max_seq_len=32, block_size=16, dropout_rate=0.0, dtype=jnp.float32,
        attention_backend="xla", remat=False,
    )
    tc = TrainConfig(grad_accum=1, warmup_steps=1, total_steps=4,
                     learning_rate=1e-3, weight_decay=0.0)
    params = init_transformer(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (4, 17), 0, cfg.vocab_size)
    batch = {"tokens": tokens}
    key = jax.random.key(2)

    # single-device
    tx = make_optimizer(tc)
    st = tx.init(params)
    loss0, grads = jax.value_and_grad(loss_fn)(params, batch, cfg, key)
    import optax
    updates, _ = tx.update(grads, st, params)
    p_single = optax.apply_updates(params, updates)

    # sharded (2 data x 4 model)
    mesh = make_mesh(data=2, model=4)
    tx2 = make_optimizer(tc)
    p_sh, st_sh, _ = make_sharded_train_state(mesh, params, tx2)
    step = make_sharded_train_step(mesh, cfg, tx2, loss_fn)
    p_sh, st_sh, loss_sh = step(p_sh, st_sh, batch, key)

    np.testing.assert_allclose(float(loss_sh), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(jax.device_get(b), np.float32),
            rtol=1e-4, atol=1e-5,
        )


def test_param_partition_specs_cover_tree():
    cfg = TransformerConfig(
        vocab_size=64, d_model=64, n_layers=1, n_heads=4, d_ff=128,
        max_seq_len=32,
    )
    params = init_transformer(jax.random.key(0), cfg)
    specs = param_partition_specs(params)
    # same tree structure
    assert jax.tree.structure(specs) == jax.tree.structure(params)
    flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert any(s == P(None, "model") for s in flat)
    assert any(s == P("model", None) for s in flat)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_bidir_matches_oracle(causal):
    import functools

    from flashattention_tpu.parallel.ring import ring_attention_bidir

    mesh = make_mesh(data=1, model=1, context=4)
    q, k, v = make_qkv(1, 2, 128, 32)  # 32 per shard -> halves of 16
    spec = P(None, None, "context", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P(None, None, "context")), check_vma=False,
    )
    def ring(q_, k_, v_):
        return ring_attention_bidir(
            q_, k_, v_, axis_name="context", causal=causal, backend="xla"
        )

    o, lse = jax.jit(ring)(q, k, v)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_all_gather_attention_matches_oracle(causal):
    """all-gather CP with the per-chip *traced* q_offset through the kernels
    (no elementwise-mask fallback)."""
    import functools

    from flashattention_tpu.parallel.ring import all_gather_attention

    mesh = make_mesh(data=1, model=1, context=4)
    q, k, v = make_qkv(1, 2, 128, 32)
    spec = P(None, None, "context", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P(None, None, "context")), check_vma=False,
    )
    def ag(q_, k_, v_):
        return all_gather_attention(
            q_, k_, v_, axis_name="context", causal=causal, backend="xla"
        )

    o, lse = jax.jit(ag)(q, k, v)
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


def test_ring_bidir_causal_grads_match_oracle():
    """Grads flow through the bidir ring's q_offset diagonal path (the route
    that previously dropped to an elementwise mask)."""
    import functools

    from flashattention_tpu.ops.reference import reference_attention_grads
    from flashattention_tpu.parallel.ring import ring_attention_bidir

    mesh = make_mesh(data=1, model=1, context=4)
    q, k, v = make_qkv(1, 2, 128, 32)
    do = jax.random.normal(jax.random.key(9), q.shape, jnp.float32)
    spec = P(None, None, "context", None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P(None, None, "context")), check_vma=False,
    )
    def ring(q_, k_, v_):
        return ring_attention_bidir(
            q_, k_, v_, axis_name="context", causal=True, backend="xla"
        )

    def loss(q_, k_, v_):
        o, _ = ring(q_, k_, v_)
        return jnp.sum(o * do)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    gr = reference_attention_grads(q, k, v, do, causal=True)
    for a, b in zip(g, gr):
        assert_allclose(a, b, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_segment_ids_matches_oracle(causal):
    """Packed varlen THROUGH context parallelism: documents packed across
    shard boundaries; KV-side ids rotate around the ring with their shard.
    Must equal the dense oracle under the block-diagonal segment mask."""
    from flashattention_tpu.parallel.ring import ring_attention

    mesh = make_mesh(data=1, model=1, context=8)
    b, h, n, d = 2, 2, 256, 32  # 32 per context shard
    q, k, v = make_qkv(b, h, n, d)
    ids = np.zeros((b, n), np.int32)
    ids[0, 70:] = 1          # boundary inside shard 2
    ids[1, 40:] = 1
    ids[1, 200:] = 2         # several docs, crossing shards
    ids = jnp.asarray(ids)
    spec = P(None, None, "context", None)
    ispec = P(None, "context")

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec, ispec),
        out_specs=(spec, P(None, None, "context")), check_vma=False,
    )
    def run(q_, k_, v_, ids_):
        return ring_attention(
            q_, k_, v_, axis_name="context", causal=causal, backend="xla",
            segment_ids=ids_,
        )

    o, lse = run(q, k, v, ids)
    seg_mask = ids[:, None, :, None] == ids[:, None, None, :]
    o_ref, lse_ref = reference_attention(q, k, v, causal=causal, mask=seg_mask)
    assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


def test_bidir_and_allgather_segment_ids_match_oracle():
    from flashattention_tpu.parallel.ring import (
        all_gather_attention,
        ring_attention_bidir,
    )

    mesh = make_mesh(data=1, model=1, context=4)
    b, h, n, d = 1, 2, 256, 32  # 64 per shard (even halves of 32)
    q, k, v = make_qkv(b, h, n, d)
    ids = np.zeros((b, n), np.int32)
    ids[0, 50:] = 1
    ids[0, 130:] = 2
    ids = jnp.asarray(ids)
    spec = P(None, None, "context", None)
    ispec = P(None, "context")
    seg_mask = ids[:, None, :, None] == ids[:, None, None, :]
    o_ref, lse_ref = reference_attention(q, k, v, causal=True, mask=seg_mask)

    for fn in (ring_attention_bidir, all_gather_attention):
        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec, ispec),
            out_specs=(spec, P(None, None, "context")), check_vma=False,
        )
        def run(q_, k_, v_, ids_, fn=fn):
            return fn(
                q_, k_, v_, axis_name="context", causal=True, backend="xla",
                segment_ids=ids_,
            )

        o, lse = run(q, k, v, ids)
        assert_allclose(o, o_ref, rtol=1e-4, atol=1e-4)
        assert_allclose(lse, lse_ref, rtol=1e-3, atol=1e-3)


def test_zero1_optimizer_sharding_matches_single_device():
    """ZeRO-1: AdamW moments sharded over the 'data' axis. The train step
    must still produce single-device-identical params, and the moment
    leaves must actually be data-sharded (1/n_data per rank)."""
    import optax

    cfg = TransformerConfig(
        vocab_size=64, d_model=64, n_layers=1, n_heads=4, d_ff=64,
        max_seq_len=32, block_size=16, dropout_rate=0.0, dtype=jnp.float32,
        attention_backend="xla", remat=False,
    )
    tc = TrainConfig(grad_accum=1, warmup_steps=1, total_steps=4,
                     learning_rate=1e-3, weight_decay=0.0)
    params = init_transformer(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (4, 17), 0, cfg.vocab_size)
    batch = {"tokens": tokens}
    key = jax.random.key(2)

    tx = make_optimizer(tc)
    st = tx.init(params)
    loss0, grads = jax.value_and_grad(loss_fn)(params, batch, cfg, key)
    updates, _ = tx.update(grads, st, params)
    p_single = optax.apply_updates(params, updates)

    mesh = make_mesh(data=4, model=2)
    tx2 = make_optimizer(tc)
    p_sh, st_sh, _ = make_sharded_train_state(mesh, params, tx2, zero1=True)

    # moments really are sharded over 'data'
    def on_data(spec):
        return any(
            ax == "data" or (isinstance(ax, tuple) and "data" in ax)
            for ax in spec
        )

    data_sharded = [
        leaf for leaf in jax.tree.leaves(st_sh)
        if hasattr(leaf, "sharding") and on_data(leaf.sharding.spec)
    ]
    assert len(data_sharded) > 0, "no optimizer leaf sharded over data"
    big = max(data_sharded, key=lambda x: x.size)
    shard_frac = big.addressable_shards[0].data.size / big.size
    assert shard_frac <= 1 / mesh.shape["data"] + 1e-9

    step = make_sharded_train_step(mesh, cfg, tx2, loss_fn)
    p_sh, st_sh, loss_sh = step(p_sh, st_sh, batch, key)
    np.testing.assert_allclose(float(loss_sh), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(jax.device_get(b), np.float32),
            rtol=1e-4, atol=1e-5,
        )
    # params stayed on the TP spec (not silently left data-sharded)
    for leaf in jax.tree.leaves(p_sh):
        assert not on_data(leaf.sharding.spec)


def test_sharded_train_step_packed_varlen_batch():
    """The dp x tp step must accept the packed-varlen batch loss_fn
    documents ({'tokens', 'segment_ids'}): the sharding constraint pytree
    is built from the batch itself, so every batch-leading leaf shards on
    'data' (a tokens-only constraint dict crashed packed batches —
    review r5)."""
    from flashattention_tpu.models.train import (
        TrainConfig, loss_fn, make_optimizer,
    )
    from flashattention_tpu.models.transformer import (
        TransformerConfig, init_transformer,
    )
    from flashattention_tpu.parallel import (
        make_mesh, make_sharded_train_state, make_sharded_train_step,
    )

    cfg = TransformerConfig(
        vocab_size=128, d_model=64, n_layers=1, n_heads=2, d_ff=128,
        max_seq_len=64, dropout_rate=0.0,
    )
    mesh = make_mesh(data=2, model=2)
    tx = make_optimizer(TrainConfig(warmup_steps=2, total_steps=8))
    params = init_transformer(jax.random.key(0), cfg)
    p_sh, st_sh, _ = make_sharded_train_state(mesh, params, tx)
    step = make_sharded_train_step(mesh, cfg, tx, loss_fn)
    tokens = jax.random.randint(jax.random.key(1), (4, 32), 0, 128)
    segs = jnp.zeros((4, 32), jnp.int32).at[:, 16:].set(1)
    _, _, loss = step(
        p_sh, st_sh, {"tokens": tokens, "segment_ids": segs},
        jax.random.key(2),
    )
    assert np.isfinite(float(loss))
