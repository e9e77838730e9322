"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(mesh/pjit/shard_map/ring attention) is exercised without TPU hardware —
the TPU-native replacement for the reference's capability-gated skipping
(reference tests/conftest.py:15-41). Pallas kernels run in interpreter mode
on CPU automatically (flashattention_tpu.ops.pallas_attn._interpret_default).
"""

import os
import sys

# Must be set before jax initializes its backends. Force CPU even if the
# environment points at a TPU: tests validate numerics and sharding logic on
# 8 virtual devices; the driver benches on real hardware separately.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize registers the TPU plugin at interpreter
# startup and pins jax_platforms="axon,cpu"; backends initialize lazily, so
# overriding here (before any device use) still lands tests on CPU.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long e2e tests (serving engine, process-isolated multihost, "
        "pipeline/MoE train steps). Fast lane: pytest -m 'not slow' "
        "(<10 min); the full suite (~35 min) remains the merge gate.",
    )


@pytest.fixture(scope="session")
def mesh8():
    """2x4 (data, model) mesh over the 8 virtual CPU devices."""
    import numpy as np
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "model"))
