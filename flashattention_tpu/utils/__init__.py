"""Shared utilities: tolerances, test data, timing."""

from flashattention_tpu.utils.profiling import compiled_cost, timed, trace
from flashattention_tpu.utils.testing import (
    assert_allclose,
    dtype_tolerances,
    make_qkv,
)

__all__ = [
    "assert_allclose", "dtype_tolerances", "make_qkv",
    "compiled_cost", "timed", "trace",
]
