"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    context: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a (data, model, context) mesh.

    ``data`` — batch/DP axis (cross-host DCN-friendly),
    ``model`` — TP axis: attention heads, MLP hidden, vocab shards (ICI),
    ``context`` — sequence/CP axis for ring attention (ICI ring).

    Any axis of size 1 is kept (size-1 axes are free and keep PartitionSpecs
    uniform across topologies).
    """
    devices = devices if devices is not None else jax.devices()
    n = data * model * context
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for mesh ({data}, {model}, {context}), "
            f"have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(data, model, context)
    return Mesh(arr, axis_names=("data", "model", "context"))
