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
