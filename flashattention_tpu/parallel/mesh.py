"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    context: int = 1,
    pipe: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a (data, pipe, model, context) mesh.

    ``data`` — batch/DP axis (cross-host DCN-friendly, outermost),
    ``pipe`` — pipeline-stage axis (parallel/pipeline.py; stage hops are
    point-to-point ppermutes, so it sits between data and the
    bandwidth-hungry inner axes),
    ``model`` — TP axis: attention heads, MLP hidden, vocab shards (ICI),
    ``context`` — sequence/CP axis for ring attention (ICI ring).

    Any axis of size 1 is kept (size-1 axes are free and keep PartitionSpecs
    uniform across topologies).
    """
    devices = devices if devices is not None else jax.devices()
    n = data * model * context * pipe
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for mesh ({data}, {pipe}, {model}, "
            f"{context}), have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(data, pipe, model, context)
    return Mesh(arr, axis_names=("data", "pipe", "model", "context"))
