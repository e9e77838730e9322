"""Kernel tuning specs — block shapes picked by head_dim / dtype.

TPU-native equivalent of the reference's per-algorithm spec tables
(src/fa1/spec.py:3-12, src/fa2/spec.py:3-12, src/fa3/spec.py:3-13, which pick
``br/bc/num_warps`` from head_dim). On TPU there are no warps; the tunables
are the Q/KV tile sizes (MXU/VPU lane constraints: last dim 128, sublane
multiples of 8 fp32 / 16 bf16 / 32 fp8) and, for FA3, the software pipeline
depth (``stages`` — which the reference plumbs but never uses, quirk Q6; here
it selects the number of in-flight KV tile buffers).
"""

from __future__ import annotations

import dataclasses

MIN_BLOCK = 128  # TPU lane width; minimum useful tile dim on any axis.


@dataclasses.dataclass(frozen=True)
class FA1Spec:
    """FA1 schedule: rescale-accumulator-every-step online softmax, no
    software pipelining (single-buffered KV DMA)."""

    block_q: int
    block_k: int
    stages: int = 1  # FA1-era: no DMA/compute overlap.
    bwd_block_q: int | None = None  # None = same tiling as forward
    bwd_block_k: int | None = None

    def validate(self) -> None:
        if self.block_q % 8 or self.block_k % MIN_BLOCK:
            raise ValueError(f"misaligned spec {self}")


@dataclasses.dataclass(frozen=True)
class FA2Spec:
    """FA2 schedule: deferred normalization (divide by l once, at the end),
    double-buffered KV stream."""

    block_q: int
    block_k: int
    stages: int = 2
    bwd_block_q: int | None = None
    bwd_block_k: int | None = None

    def validate(self) -> None:
        if self.block_q % 8 or self.block_k % MIN_BLOCK:
            raise ValueError(f"misaligned spec {self}")


@dataclasses.dataclass(frozen=True)
class FA3Spec:
    """FA3 schedule: FA2 + FP8 tiles with per-block descale + deeper pipeline."""

    block_q: int
    block_k: int
    stages: int = 2  # KV-tile pipeline depth (double buffering by default).
    bwd_block_q: int | None = None
    bwd_block_k: int | None = None

    def validate(self) -> None:
        if self.block_q % 32 or self.block_k % MIN_BLOCK:
            # fp8 sublane tile is 32.
            raise ValueError(f"misaligned spec {self}")


# Measured per-(seq, head_dim) block table (VERDICT r1 item 9): v5e, bf16,
# forward+backward weighted, from `scripts/tune_attention.py --grid` runs
# gated on a healthy matmul speed-of-light window (conditions + raw numbers
# in RESULTS.md "Spec table"). Keys are (seq_bucket, dim_bucket) where
# seq_bucket = smallest of (2048, 8192, 16384+) >= N and dim_bucket =
# smallest of (64, 128, 256+) >= d. The reference keys on head_dim alone
# (src/fa1/spec.py:9-12); seq-aware picking generalizes it.
_SEQ_BUCKETS = (2048, 8192)     # else "16384+"
_DIM_BUCKETS = (64, 128)        # else "256+"

_MEASURED_BLOCKS: dict[
    tuple[int, int], tuple[int, int, int | None, int | None]
] = {
    # (seq_bucket, dim_bucket):
    #     (fwd block_q, fwd block_k, bwd block_q, bwd block_k)
    # — bwd None means "same tiling as forward". Forward and backward tile
    # independently since the bwd_block_* plumbing (pallas_attn.py), because
    # the measured winners differ per direction.
    #
    # r2 grid (scripts/tune_attention.py --grid, two-point timing, fwd+2*bwd
    # weighted score; raw rows in RESULTS.md "Spec table"):
    # - d=64: (1024,1024) FORWARD is fastest in both measured seq cells
    #   (66.3 vs 62.8 @2K, 75.1 vs 68.3 @8K) but its backward fails or
    #   hangs Mosaic, so the pair is fwd (1024,1024) / bwd (512,1024).
    # - d=128: (512,1024) by 1.07-1.5x over (256,512); (1024,1024)
    #   unmeasured (glitch/no-compile rows).
    # - d=256: (512,1024) by default AND by score — (256,512)+d256
    #   backward is a pathological remote-Mosaic compile (>15 min hang,
    #   deterministic; the r1 table's d=256 row was an untested trap),
    #   while (512,1024)+d256 reads the best credited TFLOP/s of any cell.
    # 16384 rows MEASURED (r4 grid, queue12/grid_16k.log) — they confirm
    # the previously-inherited 8192 winners:
    # - d=64: fwd (1024,1024) 89.9 TF vs (512,1024) 73.5; bwd (512,1024)
    #   64.4 (the (1024,1024) backward Mosaic hang persists at 16K).
    # - d=128: (512,1024) fwd 167.7 / bwd 142.6 vs (256,512) 96.7/100.1.
    #   (The auto-scorer printed (256,512) here only because the
    #   (512,1024) bwd record's SOL PROBE read 216 TF > physical peak and
    #   the fit-glitch filter drops whole records; the kernel's own 142.6
    #   TF is a plausible, consistent reading.)
    # - d=256: (512,1024) score 422.8 (fwd 188.2 / bwd 117.3); the
    #   (256,512) and (1024,1024) backwards remain pathological compiles
    #   at 16K (SKIP rows), exactly as at 8K.
    (2048, 64): (1024, 1024, 512, 1024),
    (2048, 128): (512, 1024, None, None),
    (2048, 256): (512, 1024, None, None),
    (8192, 64): (1024, 1024, 512, 1024),
    (8192, 128): (512, 1024, None, None),
    (8192, 256): (512, 1024, None, None),
    (16384, 64): (1024, 1024, 512, 1024),
    (16384, 128): (512, 1024, None, None),
    (16384, 256): (512, 1024, None, None),
}


def _bucket(value: int, edges: tuple[int, ...], top: int) -> int:
    for e in edges:
        if value <= e:
            return e
    return top


def _pick_blocks(
    head_dim: int, seqlen: int | None
) -> tuple[int, int, int | None, int | None]:
    n = seqlen if seqlen is not None else 8192
    key = (
        _bucket(n, _SEQ_BUCKETS, 16384),
        _bucket(head_dim, _DIM_BUCKETS, 256),
    )
    return _MEASURED_BLOCKS[key]


def pick_fa1_spec(head_dim: int, seqlen: int | None = None) -> FA1Spec:
    """Reference picks br=128/bc=128 for d<=64 else br=64 (src/fa1/spec.py:9-12).
    On TPU the measured table above decides; N=8K d=128: 512x1024 beats
    256x512 by 1.5x."""
    bq, bk, bbq, bbk = _pick_blocks(head_dim, seqlen)
    return FA1Spec(block_q=bq, block_k=bk, bwd_block_q=bbq, bwd_block_k=bbk)


def pick_fa2_spec(head_dim: int, seqlen: int | None = None) -> FA2Spec:
    bq, bk, bbq, bbk = _pick_blocks(head_dim, seqlen)
    return FA2Spec(block_q=bq, block_k=bk, bwd_block_q=bbq, bwd_block_k=bbk)


def pick_fa3_spec(head_dim: int, seqlen: int | None = None) -> FA3Spec:
    bq, bk, bbq, bbk = _pick_blocks(head_dim, seqlen)
    return FA3Spec(
        block_q=bq, block_k=bk, stages=2, bwd_block_q=bbq, bwd_block_k=bbk
    )
