"""Multi-chip parallelism: mesh construction, sharded training, head-parallel
attention, ring/context parallelism.

Entirely new scope vs. the reference, which has no distributed code of any
kind (SURVEY.md §2.4: no DP/TP/SP/CP, no collectives). The TPU-native stack:
``jax.sharding.Mesh`` + pjit/GSPMD for dp/tp training, ``shard_map`` +
``ppermute`` for ring attention over ICI.
"""

from flashattention_tpu.parallel.mesh import make_mesh
from flashattention_tpu.parallel.pipeline import (
    make_pipeline_forward,
    make_pipelined_train_state,
    make_pipelined_train_step,
    stack_pipeline_params,
    unstack_pipeline_params,
)
from flashattention_tpu.parallel.ring import (
    all_gather_attention,
    ring_attention,
)
from flashattention_tpu.parallel.sharded import (
    head_sharded_attention,
    make_sharded_train_state,
    make_sharded_train_step,
    param_partition_specs,
)

__all__ = [
    "make_mesh",
    "ring_attention",
    "all_gather_attention",
    "head_sharded_attention",
    "param_partition_specs",
    "make_sharded_train_state",
    "make_sharded_train_step",
    "stack_pipeline_params",
    "unstack_pipeline_params",
    "make_pipeline_forward",
    "make_pipelined_train_state",
    "make_pipelined_train_step",
]
