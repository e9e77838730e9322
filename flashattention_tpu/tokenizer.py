"""Byte-level BPE tokenizer — the reference's tiktoken dependency, made local.

The reference tokenizes OpenWebText with ``tiktoken.get_encoding("gpt2")``
(src/fa3/torch/flashattention_pytorch.py:788-794), a network dependency:
tiktoken fetches its vocab from a CDN on first use, which this environment
(and any air-gapped TPU pod) cannot do. This module provides the same
byte-level BPE scheme with no downloads:

- ``BPETokenizer.from_files`` loads the standard GPT-2 ``encoder.json`` +
  ``vocab.bpe`` pair if a copy exists locally — ids then match tiktoken's
  ``gpt2`` encoding for text without special tokens (same byte table, same
  merge list, same split pattern).
- ``BPETokenizer.train`` learns a small byte-level BPE from a corpus, so
  subword tokenization works end-to-end on real text with zero artifacts.
- ``save``/``from_files`` roundtrip in the GPT-2 file format.

Used by ``data.load_token_stream(path, tokenizer=tok.encode)``; the byte
fallback (``data.tokenize_bytes``) remains the zero-setup default.
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import numpy as np

try:  # GPT-2's exact split pattern needs unicode classes (\p{L}).
    import regex as _re

    _PAT = _re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
    )
except ImportError:  # pragma: no cover - regex is in the base image
    import re as _re

    _PAT = _re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
    )


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode table: the 188 printable
    latin-1 bytes map to themselves; the rest shift into U+0100.. so every
    token string is printable (and vocab files stay human-readable)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_ENC = bytes_to_unicode()
_BYTE_DEC = {v: k for k, v in _BYTE_ENC.items()}


class BPETokenizer:
    """Byte-level BPE: greedy lowest-rank pair merging per regex-split word."""

    def __init__(self, encoder: dict[str, int], merges: list[tuple[str, str]]):
        self.encoder = dict(encoder)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}

    # -- construction ------------------------------------------------------

    @classmethod
    def from_files(cls, encoder_json: str | Path, vocab_bpe: str | Path):
        """Load the GPT-2 artifact pair (``encoder.json`` + ``vocab.bpe``)."""
        encoder = json.loads(Path(encoder_json).read_text(encoding="utf-8"))
        lines = Path(vocab_bpe).read_text(encoding="utf-8").splitlines()
        if lines and lines[0].startswith("#"):  # "#version: 0.2" header
            lines = lines[1:]
        merges = [tuple(l.split()) for l in lines if len(l.split()) == 2]
        return cls(encoder, merges)

    @classmethod
    def train(cls, text: str, vocab_size: int) -> "BPETokenizer":
        """Learn merges from ``text`` until the vocab reaches ``vocab_size``
        (>= 256; byte tokens are always present)."""
        if vocab_size < 256:
            raise ValueError("vocab_size must be >= 256 (byte base vocab)")
        # Word frequency table, each word a tuple of byte-unicode symbols.
        words = Counter()
        for w in _PAT.findall(text):
            words[tuple(_BYTE_ENC[b] for b in w.encode("utf-8"))] += 1
        encoder = {ch: i for i, ch in enumerate(_BYTE_ENC[b] for b in range(256))}
        merges: list[tuple[str, str]] = []
        while len(encoder) < vocab_size:
            pairs = Counter()
            for word, freq in words.items():
                for a, b in zip(word, word[1:]):
                    pairs[(a, b)] += freq
            if not pairs:
                break
            (a, b), freq = pairs.most_common(1)[0]
            if freq < 2:
                break  # nothing left worth merging
            merges.append((a, b))
            encoder[a + b] = len(encoder)
            merged = {}
            for word, f in words.items():
                out, i = [], 0
                while i < len(word):
                    if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(word[i])
                        i += 1
                key = tuple(out)
                merged[key] = merged.get(key, 0) + f
            words = Counter(merged)
        return cls(encoder, merges)

    def save(self, directory: str | Path) -> None:
        """Write the GPT-2 artifact pair so ``from_files`` roundtrips."""
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        (d / "encoder.json").write_text(
            json.dumps(self.encoder, ensure_ascii=False), encoding="utf-8"
        )
        inv = sorted(self.ranks, key=self.ranks.get)
        (d / "vocab.bpe").write_text(
            "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in inv) + "\n",
            encoding="utf-8",
        )

    # -- encode / decode ---------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _bpe(self, token: str) -> list[str]:
        """Merge the byte-unicode symbols of one pre-split word, lowest
        learned rank first (the BPE greedy order)."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = list(token)
        while len(parts) > 1:
            pairs = set(zip(parts, parts[1:]))
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            a, b = best
            out, i = [], 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        self._cache[token] = parts
        return parts

    def encode(self, text: str) -> np.ndarray:
        ids: list[int] = []
        for word in _PAT.findall(text):
            sym = "".join(_BYTE_ENC[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._bpe(sym))
        return np.asarray(ids, dtype=np.int32)

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in np.asarray(ids).ravel())
        return bytes(_BYTE_DEC[c] for c in text).decode("utf-8", errors="replace")
