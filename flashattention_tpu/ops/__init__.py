"""Kernel library: oracle, tiled XLA executor, Pallas TPU kernels, FP8."""

from flashattention_tpu.ops.api import (
    fa1_attention,
    fa2_attention,
    fa3_attention,
    alibi_slopes,
    flash_attention,
    flash_attention_kvpacked,
    flash_attention_qkvpacked,
)
from flashattention_tpu.ops.pallas_attn import pallas_attention
from flashattention_tpu.ops.pallas_paged import pallas_paged_attention
from flashattention_tpu.ops.pallas_sparse import pallas_sparse_attention
from flashattention_tpu.ops.reference import (
    causal_mask,
    reference_attention,
    reference_attention_grads,
)
from flashattention_tpu.ops.tiled import tiled_attention

__all__ = [
    "fa1_attention",
    "fa2_attention",
    "fa3_attention",
    "alibi_slopes",
    "flash_attention",
    "flash_attention_kvpacked",
    "flash_attention_qkvpacked",
    "pallas_attention",
    "pallas_paged_attention",
    "pallas_sparse_attention",
    "tiled_attention",
    "reference_attention",
    "reference_attention_grads",
    "causal_mask",
]
