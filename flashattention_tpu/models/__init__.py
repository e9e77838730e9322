"""Model zoo: decoder-only transformer LM built on the flash-attention ops.

TPU-native re-design of the reference's self-contained training application
(src/fa3/torch/flashattention_pytorch.py, 963 LoC): same architecture family
(GPT-style post-LN decoder, fused-QKV attention, learned positional
embeddings, block-sparse attention support, KV-cache decode), written as
pure-functional JAX (init/apply over pytrees) so it composes with jit/pjit/
shard_map directly.
"""

from flashattention_tpu.models.compat import (
    apply_reference_transformer,
    convert_reference_state_dict,
    reference_lm_loss,
)
from flashattention_tpu.models.transformer import (
    TransformerConfig,
    apply_transformer,
    decode_step,
    init_kv_cache,
    init_transformer,
)

__all__ = [
    "TransformerConfig",
    "init_transformer",
    "apply_transformer",
    "init_kv_cache",
    "decode_step",
    "convert_reference_state_dict",
    "apply_reference_transformer",
    "reference_lm_loss",
]
