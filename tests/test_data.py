"""Data pipeline tests (the reference's tokenize-once token-stream slicing,
flashattention_pytorch.py:735-816, had no tests)."""

import numpy as np
import jax.numpy as jnp

from flashattention_tpu.data import (
    TokenStreamDataset,
    load_token_stream,
    prefetch,
    tokenize_bytes,
)


def test_tokenize_bytes_roundtrip():
    t = tokenize_bytes("hello")
    assert t.dtype == np.int32 and t.tolist() == [104, 101, 108, 108, 111]


def test_stream_slicing_and_batches(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("abcdefghij" * 50)  # 500 bytes
    stream = load_token_stream(p)
    ds = TokenStreamDataset(stream, seq_len=16)
    assert len(ds) == (500 - 17) // 16 + 1
    ex = ds[0]
    assert ex.shape == (17,)
    batches = list(ds.batches(4, epochs=1, seed=1))
    assert all(b["tokens"].shape == (4, 17) for b in batches)
    # shuffled across epochs but deterministic per seed
    b1 = list(ds.batches(4, epochs=1, seed=1))
    np.testing.assert_array_equal(batches[0]["tokens"], b1[0]["tokens"])


def test_prefetch_preserves_order():
    items = [{"tokens": np.full((1, 3), i)} for i in range(10)]
    out = list(prefetch(iter(items), depth=3))
    assert [int(o["tokens"][0, 0]) for o in out] == list(range(10))


def test_train_on_real_stream(tmp_path):
    """End-to-end: file -> stream -> batches -> train() reduces loss."""
    import jax
    from flashattention_tpu.models.train import TrainConfig, train
    from flashattention_tpu.models.transformer import TransformerConfig

    p = tmp_path / "corpus.txt"
    p.write_text("the quick brown fox jumps over the lazy dog. " * 200)
    stream = load_token_stream(p)
    ds = TokenStreamDataset(stream, seq_len=32)
    cfg = TransformerConfig(
        vocab_size=256, d_model=64, n_layers=1, n_heads=4, d_ff=128,
        max_seq_len=64, block_size=32, dropout_rate=0.0,
        dtype=jnp.float32, attention_backend="xla",
    )
    tc = TrainConfig(
        batch_size=4, seq_len=32, total_steps=20, grad_accum=1,
        warmup_steps=2, log_every=5,
    )
    _, _, losses = train(cfg, tc, prefetch(ds.batches(4, seed=0)), verbose=False)
    assert losses[-1] < losses[0]  # byte-level text is very learnable


def test_batches_raises_when_dataset_smaller_than_batch():
    """n_examples < batch_size with drop_last=True yields ZERO batches per
    epoch; with epochs=None the generator would spin forever and next()
    would hang the training job (review r5) — it must fail loud instead."""
    import pytest

    ds = TokenStreamDataset(np.arange(200, dtype=np.int32), seq_len=16)
    with pytest.raises(ValueError, match="drop_last"):
        next(ds.batches(batch_size=10 ** 6))
    # a feasible batch size still streams
    assert next(ds.batches(batch_size=4))["tokens"].shape == (4, 17)


def test_prefetch_tuple_batches_and_error_forwarding():
    """The error sentinel must be an identity object: a string compared
    against an ndarray item broadcasts to a bool array and the check
    raised 'truth value is ambiguous' on legitimate (inputs, targets)
    tuple batches (review r5)."""
    import pytest

    pairs = [(np.zeros(3), np.ones(3)) for _ in range(4)]
    out = list(prefetch(iter(pairs)))
    assert len(out) == 4 and all(isinstance(t, tuple) for t in out)

    def failing():
        yield (np.zeros(2), np.zeros(2))
        raise RuntimeError("loader died")

    with pytest.raises(RuntimeError, match="loader died"):
        list(prefetch(failing()))
