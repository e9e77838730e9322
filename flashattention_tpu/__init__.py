"""flashattention_tpu — a TPU-native FlashAttention framework.

A ground-up JAX/Pallas/pjit re-design of the capability set of
PeTeRr0/FlashAttention-pytorch (reference layer map in /root/repo/SURVEY.md):

- ``ops``      — the kernel library: dense oracle, tiled XLA executor,
                 Pallas TPU kernels (FA1/FA2/FA3 schedules), FP8 quantization,
                 public ``fa{1,2,3}_attention`` dispatchers
                 (reference: src/fa{1,2,3}/op.py, src/common/).
- ``models``   — decoder-only transformer + training loop
                 (reference: src/fa3/torch/flashattention_pytorch.py).
- ``parallel`` — mesh construction, head-sharded attention, ring/context
                 parallelism over ICI (new scope vs. the single-device reference).
- ``serving``  — paged KV cache + continuous-batched decode (new scope).
- ``utils``    — tolerances, timing, tree helpers.

Public API (mirrors the reference's L4 surface, reference src/fa1/op.py:7):

    from flashattention_tpu import fa1_attention, fa2_attention, fa3_attention
    o, lse = fa2_attention(q, k, v, causal=True)   # q,k,v: (B, H, N, D)
"""

from flashattention_tpu.ops.api import (
    fa1_attention,
    fa2_attention,
    fa3_attention,
    alibi_slopes,
    flash_attention,
    flash_attention_kvpacked,
    flash_attention_qkvpacked,
)
from flashattention_tpu.ops.reference import reference_attention
from flashattention_tpu.tokenizer import BPETokenizer
from flashattention_tpu.ops.specs import (
    FA1Spec,
    FA2Spec,
    FA3Spec,
    pick_fa1_spec,
    pick_fa2_spec,
    pick_fa3_spec,
)

__version__ = "0.1.0"

__all__ = [
    "fa1_attention",
    "fa2_attention",
    "fa3_attention",
    "alibi_slopes",
    "flash_attention",
    "flash_attention_kvpacked",
    "flash_attention_qkvpacked",
    "reference_attention",
    "BPETokenizer",
    "FA1Spec",
    "FA2Spec",
    "FA3Spec",
    "pick_fa1_spec",
    "pick_fa2_spec",
    "pick_fa3_spec",
]
