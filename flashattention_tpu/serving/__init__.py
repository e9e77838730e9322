"""Serving: paged KV cache, quantized pages, continuous-batched decode.

New scope vs. the reference (BASELINE.json north star): FP8/INT8 paged
KV-cache decode with continuous batching. The page-table machinery mirrors
the vLLM/jax paged-attention shape conventions; the scheduler is host-side
Python around a jitted decode step, with the page allocator implemented in
C++ (csrc/page_allocator.cc) behind a ctypes binding (pure-Python fallback
included).
"""

from flashattention_tpu.serving.paged_kv import (
    PagedKVCache,
    paged_attention_decode,
)
from flashattention_tpu.serving.allocator import PageAllocator
from flashattention_tpu.serving.engine import (
    EngineConfig,
    GenerationRequest,
    ServingEngine,
)
from flashattention_tpu.serving.multihost import MultiHostScheduler
from flashattention_tpu.serving.sampling import SamplingConfig, sample_logits
from flashattention_tpu.serving.speculative import (
    SpecStats,
    generate,
    speculative_generate,
)

__all__ = [
    "PagedKVCache",
    "paged_attention_decode",
    "PageAllocator",
    "EngineConfig",
    "GenerationRequest",
    "ServingEngine",
    "MultiHostScheduler",
    "SamplingConfig",
    "sample_logits",
    "SpecStats",
    "generate",
    "speculative_generate",
]
