"""Process-separated multi-host serving: N engines in their own OS processes
(own JAX runtimes) driven by the same MultiHostScheduler must produce results
identical to N in-process engines — routing validated under real process
isolation (VERDICT r1 item 10)."""

import jax
import jax.numpy as jnp
import pytest

from flashattention_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
)
from flashattention_tpu.serving.engine import (
    EngineConfig,
    GenerationRequest,
    ServingEngine,
)
from flashattention_tpu.serving.host_worker import ProcessEngine
from flashattention_tpu.serving.multihost import MultiHostScheduler

CFG = TransformerConfig(
    vocab_size=64, d_model=32, n_layers=1, n_heads=2, d_ff=32,
    max_seq_len=64, dropout_rate=0.0, block_size=16, dtype=jnp.float32,
    attention_backend="xla", remat=False,
)
ECFG = EngineConfig(
    max_batch_size=2, page_size=8, num_pages=64, max_seq_len=64,
    prefill_pad=8,
)


def _requests():
    return [
        GenerationRequest(request_id=i, prompt=[(7 * i + j) % 64 for j in
                                                range(3 + (i % 5))],
                          max_new_tokens=4 + (i % 3))
        for i in range(6)
    ]


def test_process_engines_match_in_process():
    n_hosts = 2

    # in-process baseline (engine i seeds its replica with key(i))
    engines = [
        ServingEngine(init_transformer(jax.random.key(i), CFG), CFG, ECFG)
        for i in range(n_hosts)
    ]
    sched = MultiHostScheduler(engines)
    for r in _requests():
        sched.submit(r)
    expected = sched.run()

    # process-separated: same seeds, same requests, same scheduler logic
    procs = [
        ProcessEngine(CFG, ECFG, param_seed=i, platform="cpu")
        for i in range(n_hosts)
    ]
    try:
        sched2 = MultiHostScheduler(procs)
        for r in _requests():
            sched2.submit(r)
        got = sched2.run()
    finally:
        for p in procs:
            p.close()

    assert got == expected
    assert set(got) == {r.request_id for r in _requests()}


def test_process_engines_parallel_drain():
    """run_async/wait_run: hosts decode concurrently, results still exact."""
    procs = [
        ProcessEngine(CFG, ECFG, param_seed=i, platform="cpu")
        for i in range(2)
    ]
    try:
        reqs = _requests()
        for i, r in enumerate(reqs):
            procs[i % 2].submit(r)
        for p in procs:
            p.run_async()
        merged = {}
        for p in procs:
            merged.update(p.wait_run())
    finally:
        for p in procs:
            p.close()

    # parity against one in-process engine pair driven the same way
    engines = [
        ServingEngine(init_transformer(jax.random.key(i), CFG), CFG, ECFG)
        for i in range(2)
    ]
    expected = {}
    for i, r in enumerate(reqs):
        engines[i % 2].submit(r)
    for e in engines:
        expected.update(e.run())
    assert merged == expected


def test_process_spec_engines_match_in_process():
    """Speculative replicas under real process isolation: workers build
    their own draft models (same seed -> identical drafts) and the
    scheduler's routing + greedy spec decoding must reproduce the
    in-process spec engines byte-for-byte."""
    import dataclasses

    n_hosts = 2
    dcfg = dataclasses.replace(CFG, n_layers=1, d_model=16, d_ff=16,
                               n_heads=1)
    ecfg = dataclasses.replace(ECFG, spec_gamma=2)

    engines = [
        ServingEngine(
            init_transformer(jax.random.key(i), CFG), CFG, ecfg,
            draft_params=init_transformer(jax.random.key(100 + i), dcfg),
            draft_cfg=dcfg,
        )
        for i in range(n_hosts)
    ]
    sched = MultiHostScheduler(engines)
    for r in _requests():
        sched.submit(r)
    expected = sched.run()

    procs = [
        ProcessEngine(CFG, ecfg, param_seed=i, platform="cpu",
                      draft_cfg=dcfg, draft_seed=100 + i)
        for i in range(n_hosts)
    ]
    try:
        psched = MultiHostScheduler(procs)
        for r in _requests():
            psched.submit(r)
        got = psched.run()
    finally:
        for p in procs:
            p.close()
    assert got == expected

# Fast-lane marker (VERDICT r4 item 8): these files hold the long e2e
# tests (serving engine ticks, process-isolated multihost, pipeline/MoE
# train steps). `pytest -m "not slow"` is the <10 min lane.
pytestmark = pytest.mark.slow
