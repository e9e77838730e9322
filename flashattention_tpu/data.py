"""Token-stream dataset for LM training.

TPU-native equivalent of the reference's data pipeline
(src/fa3/torch/flashattention_pytorch.py:714-816): the reference tokenizes
OpenWebText once with tiktoken into a flat token stream, then slices
``seq_len + 1`` windows per example and feeds them through a DataLoader.
This build keeps the tokenize-once stream design but stays dependency-light:

- ``bytes`` tokenizer (vocab 256) works on any text with zero downloads —
  this environment has no network egress, and the reference's
  tiktoken/datasets stack is a network dependency (reference ln 788-794).
- ``tokenizer.BPETokenizer`` — a local byte-level BPE (GPT-2/tiktoken file
  format; trainable from a corpus) for subword streams with no downloads:
  ``load_token_stream(path, tokenizer=BPETokenizer.train(text, 8192).encode)``.
- any HuggingFace tokenizer can be passed in where one is available locally.
- batches are (B, seq_len + 1) int32 arrays; ``loss_fn`` shifts them into
  (inputs, targets) (models/train.py:79-88).

Host-side prefetch uses a double-buffered iterator (the DataLoader worker
analogue, reference ln 808-816): the next batch is built on the host while
the device runs the current step.
"""

from __future__ import annotations

import threading
import queue
from pathlib import Path
from typing import Callable, Iterator

import numpy as np

VOCAB_BYTES = 256


def tokenize_bytes(text: str | bytes) -> np.ndarray:
    """Byte-level tokenization: every byte is a token id in [0, 256)."""
    if isinstance(text, str):
        text = text.encode("utf-8")
    return np.frombuffer(text, dtype=np.uint8).astype(np.int32)


def load_token_stream(
    path: str | Path,
    tokenizer: Callable[[str], np.ndarray] | None = None,
) -> np.ndarray:
    """Tokenize a text file once into a flat int32 stream
    (reference FlashAttentionDataset, ln 735-782)."""
    raw = Path(path).read_bytes()
    if tokenizer is None:
        return tokenize_bytes(raw)
    return np.asarray(tokenizer(raw.decode("utf-8")), dtype=np.int32)


class TokenStreamDataset:
    """Slices (seq_len + 1)-token windows out of a flat stream.

    ``stride`` defaults to seq_len (non-overlapping windows, the reference's
    slicing, ln 765-774); smaller strides give overlapping windows.
    """

    def __init__(self, stream: np.ndarray, seq_len: int, stride: int | None = None):
        if stream.ndim != 1:
            raise ValueError(f"stream must be 1-D, got {stream.shape}")
        self.stream = stream.astype(np.int32)
        self.seq_len = seq_len
        self.stride = stride or seq_len
        n = (len(stream) - seq_len - 1) // self.stride + 1
        if n <= 0:
            raise ValueError(
                f"stream of {len(stream)} tokens too short for seq_len {seq_len}"
            )
        self.n_examples = n

    def __len__(self) -> int:
        return self.n_examples

    def __getitem__(self, i: int) -> np.ndarray:
        start = i * self.stride
        return self.stream[start: start + self.seq_len + 1]

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        epochs: int | None = None,
        drop_last: bool = True,
    ) -> Iterator[dict]:
        """Yields {"tokens": (B, seq_len+1) int32} batches."""
        rng = np.random.default_rng(seed)
        if drop_last and self.n_examples < batch_size:
            # Zero batches per epoch: with epochs=None the while loop
            # would spin forever yielding nothing and next() would hang
            # the training job at 100% CPU (review r5) — fail loud.
            raise ValueError(
                f"n_examples={self.n_examples} < batch_size={batch_size} "
                "with drop_last=True yields no batches ever; shrink the "
                "batch or pass drop_last=False"
            )
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(self.n_examples)
            if shuffle:
                rng.shuffle(order)
            stop = (
                self.n_examples - batch_size + 1 if drop_last
                else self.n_examples
            )
            for i in range(0, max(stop, 0), batch_size):
                idx = order[i: i + batch_size]
                yield {"tokens": np.stack([self[j] for j in idx])}
            epoch += 1


def pack_documents(
    docs: list[np.ndarray],
    seq_len: int,
    *,
    min_tokens: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy sequence packing: variable-length documents -> fixed
    (rows, seq_len + 1) token rows + matching segment-id rows.

    The TPU-shaped answer to ragged batches (the reference pads or slices a
    flat stream; flash-attn's cu_seqlens API is the CUDA analogue): every
    row is a static shape, each document is one contiguous segment, and the
    kernels' segment-id compare keeps attention within documents. Documents
    longer than a row are split across rows (each chunk its own segment —
    next-token supervision never crosses a row edge anyway). Row tails too
    short for ``min_tokens`` of a new document are padded with id -1, which
    ``loss_fn`` drops.

    Returns (tokens, segment_ids), both (rows, seq_len + 1) int32. Feed as
    ``{"tokens": t[i:j], "segment_ids": s[i:j]}`` batches.
    """
    width = seq_len + 1
    rows_t: list[np.ndarray] = []
    rows_s: list[np.ndarray] = []
    cur_t = np.zeros((width,), np.int32)
    cur_s = np.full((width,), -1, np.int32)
    fill = 0
    next_id = 0

    def flush():
        nonlocal fill, cur_t, cur_s
        if fill > 0:
            rows_t.append(cur_t)
            rows_s.append(cur_s)
            cur_t = np.zeros((width,), np.int32)
            cur_s = np.full((width,), -1, np.int32)
            fill = 0

    for doc in docs:
        doc = np.asarray(doc, np.int32).ravel()
        off = 0
        while off < len(doc):
            if width - fill < min_tokens:
                flush()
            take = min(len(doc) - off, width - fill)
            cur_t[fill: fill + take] = doc[off: off + take]
            cur_s[fill: fill + take] = next_id
            fill += take
            off += take
            next_id += 1  # each chunk is its own segment
            if fill == width:
                flush()
    flush()
    if not rows_t:
        raise ValueError("no documents with tokens to pack")
    return np.stack(rows_t), np.stack(rows_s)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Host-side prefetch: builds the next batch while the device computes
    (the reference DataLoader-worker analogue, ln 808-816). Exceptions from
    the wrapped iterator re-raise in the consumer — a failed loader must
    fail the job, not truncate the stream."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    _ERR = object()  # identity sentinel: a string compared against an
    # ndarray item ("x" == np.zeros(3)) broadcasts to a bool ARRAY and the
    # `if` raises "truth value is ambiguous" on legitimate tuple batches
    # (review r5); `is` can never collide with user data.

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
            q.put((_ERR, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item
