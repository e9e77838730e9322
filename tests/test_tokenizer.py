"""Byte-level BPE tokenizer tests — the reference's tiktoken path
(src/fa3/torch/flashattention_pytorch.py:788-794) made local: train on real
text, roundtrip exactly, persist/reload in the GPT-2 artifact format, and
feed the LM data pipeline."""

from pathlib import Path

import numpy as np

from flashattention_tpu.data import TokenStreamDataset, load_token_stream
from flashattention_tpu.tokenizer import BPETokenizer, bytes_to_unicode

REAL_TEXT = (Path(__file__).resolve().parents[1] / "README.md").read_text(
    encoding="utf-8"
)


def test_byte_table_is_a_bijection():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_train_roundtrip_on_real_text():
    tok = BPETokenizer.train(REAL_TEXT, vocab_size=512)
    assert 256 < tok.vocab_size <= 512
    ids = tok.encode(REAL_TEXT)
    assert tok.decode(ids) == REAL_TEXT
    # Subword merges must beat byte-level tokenization on the training text.
    assert len(ids) < len(REAL_TEXT.encode("utf-8"))


def test_handles_non_ascii_and_empty():
    tok = BPETokenizer.train("héllo wörld — ünïcode! " * 5, vocab_size=300)
    s = "héllo — ünïcode"
    assert tok.decode(tok.encode(s)) == s
    assert tok.encode("").size == 0


def test_save_load_gpt2_format(tmp_path):
    tok = BPETokenizer.train(REAL_TEXT[:4000], vocab_size=320)
    tok.save(tmp_path)
    assert (tmp_path / "encoder.json").exists()
    assert (tmp_path / "vocab.bpe").read_text(encoding="utf-8").startswith(
        "#version"
    )
    tok2 = BPETokenizer.from_files(
        tmp_path / "encoder.json", tmp_path / "vocab.bpe"
    )
    s = REAL_TEXT[:1000]
    np.testing.assert_array_equal(tok.encode(s), tok2.encode(s))
    assert tok2.vocab_size == tok.vocab_size


def test_feeds_data_pipeline(tmp_path):
    """The tokenize-once stream (reference ln 735-782) with a trained BPE."""
    corpus = tmp_path / "corpus.txt"
    corpus.write_text(REAL_TEXT, encoding="utf-8")
    tok = BPETokenizer.train(REAL_TEXT, vocab_size=384)
    stream = load_token_stream(corpus, tokenizer=tok.encode)
    assert stream.dtype == np.int32
    assert stream.max() < tok.vocab_size
    ds = TokenStreamDataset(stream, seq_len=32)
    window = ds[0]
    assert window.shape == (33,)
    # The decoded window is a contiguous snippet of the original text.
    assert tok.decode(window) in REAL_TEXT


def test_native_bpe_engine_parity():
    """The C++ merge engine (csrc/bpe_encoder.cc) must produce EXACTLY the
    pure-Python ids for the same tables — incl. multi-byte unicode, empty
    text, and words that never fully merge. Skips only if the toolchain is
    absent (clean-checkout fallback contract)."""
    tok = BPETokenizer.train(REAL_TEXT, vocab_size=400)
    if tok._native_engine() is None:
        import pytest

        pytest.skip("native runtime library unavailable (no toolchain)")
    pure = BPETokenizer(
        tok.encoder, sorted(tok.ranks, key=tok.ranks.get)
    )
    pure._native_tried = True  # block the native path on this instance
    for text in (
        REAL_TEXT[:3000],
        "naïve café — résumé 123!\n\ttabs",
        "",
        "ünïcode ∑∫ emoji 🙂 bytes\x00\x01",
        "a" * 500,  # one long word exercising deep merge chains
    ):
        a, b = tok.encode(text), pure.encode(text)
        np.testing.assert_array_equal(a, b)
        assert tok.decode(a) == pure.decode(b)
    # the memo cache actually populates (the hot-loop win)
    lib, handle = tok._native
    assert lib.fat_bpe_cache_size(handle) > 0


def test_native_engine_concurrent_encode():
    """ctypes releases the GIL during fat_bpe_encode, so threads sharing
    one tokenizer reach the memo cache concurrently — the engine must
    lock it (review r5; pre-fix this was UB under rehash)."""
    import threading

    tok = BPETokenizer.train(REAL_TEXT, vocab_size=400)
    if tok._native_engine() is None:
        import pytest

        pytest.skip("native runtime library unavailable (no toolchain)")
    errs: list = []

    def run(seed):
        try:
            for i in range(30):
                s = REAL_TEXT[i * 37 % 2000: i * 37 % 2000 + 300 + seed]
                ids = tok.encode(s)
                assert tok.decode(ids) == s
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errs.append(e)

    threads = [threading.Thread(target=run, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
