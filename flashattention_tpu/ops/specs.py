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
    """FA1 schedule: rescale-accumulator-every-step online softmax."""

    block_q: int
    block_k: int

    def validate(self) -> None:
        if self.block_q % 8 or self.block_k % MIN_BLOCK:
            raise ValueError(f"misaligned spec {self}")


@dataclasses.dataclass(frozen=True)
class FA2Spec:
    """FA2 schedule: deferred normalization (divide by l once, at the end)."""

    block_q: int
    block_k: int

    def validate(self) -> None:
        if self.block_q % 8 or self.block_k % MIN_BLOCK:
            raise ValueError(f"misaligned spec {self}")


@dataclasses.dataclass(frozen=True)
class FA3Spec:
    """FA3 schedule: FA2 + FP8 tiles with per-block descale + deeper pipeline."""

    block_q: int
    block_k: int
    stages: int = 2  # KV-tile pipeline depth (double buffering by default).

    def validate(self) -> None:
        if self.block_q % 32 or self.block_k % MIN_BLOCK:
            # fp8 sublane tile is 32.
            raise ValueError(f"misaligned spec {self}")


def pick_fa1_spec(head_dim: int) -> FA1Spec:
    """Reference picks br=128/bc=128 for d<=64 else br=64 (src/fa1/spec.py:9-12).
    On TPU the sweep (scripts/tune_attention.py, v5e, N=8K) favors large
    tiles: 512x1024 beats 256x512 by 1.5x."""
    if head_dim <= 128:
        return FA1Spec(block_q=512, block_k=1024)
    return FA1Spec(block_q=256, block_k=512)


def pick_fa2_spec(head_dim: int) -> FA2Spec:
    if head_dim <= 128:
        return FA2Spec(block_q=512, block_k=1024)
    return FA2Spec(block_q=256, block_k=512)


def pick_fa3_spec(head_dim: int) -> FA3Spec:
    if head_dim <= 128:
        return FA3Spec(block_q=512, block_k=1024, stages=2)
    return FA3Spec(block_q=256, block_k=512, stages=2)
