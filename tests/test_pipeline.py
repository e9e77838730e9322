"""Pipeline parallelism (parallel/pipeline.py): GPipe over the 'pipe' axis.

Runs on the 8 virtual CPU devices (conftest). Parity oracle is the dense
``apply_transformer`` — the pipeline region is exactly the block stack, so
inference logits must match to fp32-rounding class and so must grads
(reverse-AD through ppermute IS the backward pipeline).

New scope vs the reference (single-GPU, SURVEY §2.4); companion to the
dp/tp tests in test_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.models.train import TrainConfig, make_optimizer
from flashattention_tpu.models.transformer import (
    TransformerConfig,
    apply_transformer,
    init_transformer,
)
from flashattention_tpu.parallel import (
    make_mesh,
    make_pipeline_forward,
    make_pipelined_train_state,
    make_pipelined_train_step,
    stack_pipeline_params,
    unstack_pipeline_params,
)

CFG = TransformerConfig(
    vocab_size=128,
    d_model=64,
    n_layers=4,
    n_heads=4,
    n_kv_heads=2,
    d_ff=128,
    max_seq_len=32,
    block_size=16,
    dropout_rate=0.0,
    dtype=jnp.float32,
    attention_backend="xla",
)


@pytest.fixture(scope="module")
def params():
    return init_transformer(jax.random.key(0), CFG)


def test_stack_roundtrip(params):
    pp = stack_pipeline_params(params, 2)
    back = unstack_pipeline_params(pp)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params,
        back,
    )


def test_stack_divisibility(params):
    with pytest.raises(ValueError, match="not divisible"):
        stack_pipeline_params(params, 3)


@pytest.mark.parametrize("pipe,n_micro", [(4, 2), (2, 4), (1, 2)])
def test_forward_matches_dense(params, pipe, n_micro):
    mesh = make_mesh(pipe=pipe)
    pp = stack_pipeline_params(params, pipe)
    fwd = jax.jit(make_pipeline_forward(mesh, CFG, n_micro))
    tokens = jax.random.randint(jax.random.key(1), (4, 16), 0, CFG.vocab_size)
    with mesh:
        got = fwd(pp, tokens)
    want = apply_transformer(params, tokens, CFG)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "variant",
    [
        dict(pos_encoding="rope"),
        dict(n_kv_heads=2),                      # GQA
        dict(attention_window=8),                # sliding window
        dict(attn_softcap=10.0),
    ],
    ids=["rope", "gqa", "window", "softcap"],
)
def test_forward_matches_dense_config_variants(variant):
    """The pipeline stage path must track the dense block for every
    attention config the block supports (same _block code, but the
    stacked-scan path could diverge if any branch trips on stacking)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, **variant)
    params_v = init_transformer(jax.random.key(7), cfg)
    mesh = make_mesh(pipe=2)
    pp = stack_pipeline_params(params_v, 2)
    fwd = jax.jit(make_pipeline_forward(mesh, cfg, 2))
    tokens = jax.random.randint(jax.random.key(8), (4, 16), 0,
                                cfg.vocab_size)
    with mesh:
        got = fwd(pp, tokens)
    want = apply_transformer(params_v, tokens, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_forward_composes_with_data_parallel(params):
    mesh = make_mesh(data=2, pipe=4)
    pp = stack_pipeline_params(params, 4)
    fwd = jax.jit(make_pipeline_forward(mesh, CFG, 2))
    tokens = jax.random.randint(jax.random.key(2), (8, 16), 0, CFG.vocab_size)
    with mesh:
        got = fwd(pp, tokens)
    want = apply_transformer(params, tokens, CFG)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_forward_batch_divisibility(params):
    mesh = make_mesh(pipe=2)
    pp = stack_pipeline_params(params, 2)
    fwd = make_pipeline_forward(mesh, CFG, 3)
    tokens = jnp.zeros((4, 16), jnp.int32)
    with pytest.raises(ValueError, match="n_micro"):
        fwd(pp, tokens)


def test_grads_match_dense(params):
    """Backward through the pipeline (AD-transposed ppermute schedule)
    produces the dense model's gradients."""
    mesh = make_mesh(pipe=4)
    pp = stack_pipeline_params(params, 4)
    fwd = make_pipeline_forward(mesh, CFG, 2)
    tokens = jax.random.randint(jax.random.key(3), (4, 17), 0, CFG.vocab_size)
    inputs, targets = tokens[:, :-1], tokens[:, 1:]

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logp, targets[..., None], axis=-1)
        )

    def pipe_loss(pp_):
        return ce(fwd(pp_, inputs))

    def dense_loss(p_):
        return ce(apply_transformer(p_, inputs, CFG))

    with mesh:
        l_pipe, g_pipe = jax.jit(jax.value_and_grad(pipe_loss))(pp)
    l_dense, g_dense = jax.jit(jax.value_and_grad(dense_loss))(params)
    np.testing.assert_allclose(float(l_pipe), float(l_dense), atol=1e-6)

    g_pipe_unstacked = unstack_pipeline_params(jax.tree.map(jnp.asarray, g_pipe))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        ),
        g_pipe_unstacked,
        g_dense,
    )


def test_train_step_runs_and_updates(params):
    mesh = make_mesh(data=2, pipe=2)
    tc = TrainConfig(total_steps=4, warmup_steps=1, batch_size=4, seq_len=16,
                     grad_accum=1)
    tx = make_optimizer(tc)
    with mesh:
        pp, opt_state, _ = make_pipelined_train_state(mesh, params, tx)
        step = make_pipelined_train_step(mesh, CFG, tx, n_micro=2)
        tokens = jax.random.randint(
            jax.random.key(4), (4, 17), 0, CFG.vocab_size
        )
        before = np.asarray(
            jax.tree.leaves(pp["stages"])[0]
        ).copy()
        losses = []
        for i in range(2):
            pp, opt_state, loss = step(
                pp, opt_state, {"tokens": tokens}, jax.random.key(i)
            )
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    after = np.asarray(jax.tree.leaves(pp["stages"])[0])
    assert not np.array_equal(before, after)


def test_remat_pipeline_forward(params):
    """cfg.remat wraps the scanned stage body in jax.checkpoint."""
    import dataclasses

    cfg_r = dataclasses.replace(CFG, remat=True, remat_policy="full")
    mesh = make_mesh(pipe=2)
    pp = stack_pipeline_params(params, 2)
    fwd = jax.jit(make_pipeline_forward(mesh, cfg_r, 2))
    tokens = jax.random.randint(jax.random.key(5), (4, 16), 0, CFG.vocab_size)
    with mesh:
        got = fwd(pp, tokens)
    want = apply_transformer(params, tokens, CFG)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )

# Fast-lane marker (VERDICT r4 item 8): these files hold the long e2e
# tests (serving engine ticks, process-isolated multihost, pipeline/MoE
# train steps). `pytest -m "not slow"` is the <10 min lane.
pytestmark = pytest.mark.slow
