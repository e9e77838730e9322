"""Process-separated multi-host serving demo + decode weak-scaling.

Validates the multi-host story under real process isolation (VERDICT r1
item 10): N ``ServingEngine`` replicas run in their own OS processes (own
JAX runtimes, pipe RPC — serving/host_worker.py), driven by the same
``MultiHostScheduler`` routing logic used in-process, and must produce
byte-identical results. Then measures decode weak-scaling: K requests *per
host* at 1..N hosts, all hosts draining concurrently — tokens/s should grow
~linearly with host count (engines share nothing).

Run (CPU by default; the workers pin jax_platforms themselves):
    python scripts/serving_multihost_demo.py --hosts 3 --requests 8

Emits one JSON line per scale point:
    {"hosts": n, "tokens": T, "wall_s": W, "tokens_per_s": ...,
     "scaling_efficiency_vs_1host": ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

# Pin the PARENT to CPU too (the workers already pin themselves). The
# environment's sitecustomize registers the axon TPU plugin at interpreter
# startup and pins jax_platforms="axon,cpu"; backends initialize lazily, so
# overriding here (before any device use) still lands on CPU — the same
# mechanism as tests/conftest.py. Without this, the in-process `expected`
# engines compute on the TPU while the ProcessEngine children compute on
# CPU, and the byte-identity parity check diverges on TPU-vs-CPU matmul
# rounding (observed 2026-08-19) — and the demo silently contends the
# shared tunnel.
jax.config.update("jax_platforms", "cpu")

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


def make_cfg(args):
    cfg = TransformerConfig(
        vocab_size=256, d_model=args.d_model, n_layers=args.layers,
        n_heads=4, d_ff=2 * args.d_model, max_seq_len=256,
        dropout_rate=0.0, block_size=32, dtype=jnp.float32,
        attention_backend="xla", remat=False,
    )
    ecfg = EngineConfig(
        max_batch_size=4, page_size=16, num_pages=256, max_seq_len=256,
        prefill_pad=32,
    )
    return cfg, ecfg


def make_requests(n, base_id=0):
    return [
        GenerationRequest(
            request_id=base_id + i,
            prompt=[(11 * (base_id + i) + j) % 256 for j in range(5 + i % 7)],
            max_new_tokens=16,
        )
        for i in range(n)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--requests", type=int, default=6, help="per host")
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args()
    cfg, ecfg = make_cfg(args)

    # -- 1. routing parity: in-process vs process-separated ----------------
    reqs = make_requests(args.hosts * args.requests)
    engines = [
        ServingEngine(init_transformer(jax.random.key(i), cfg), cfg, ecfg)
        for i in range(args.hosts)
    ]
    sched = MultiHostScheduler(engines)
    for r in reqs:
        sched.submit(r)
    expected = sched.run()

    procs = [
        ProcessEngine(cfg, ecfg, param_seed=i, platform="cpu")
        for i in range(args.hosts)
    ]
    try:
        sched2 = MultiHostScheduler(procs)
        for r in reqs:
            sched2.submit(r)
        got = sched2.run()
        assert got == expected, "process-separated results diverge!"
        print(f"parity OK: {len(got)} requests identical across "
              f"{args.hosts} isolated processes", file=sys.stderr)
    finally:
        for p in procs:
            p.close()

    # -- 2. weak scaling: K requests/host at 1..N hosts, parallel drain ----
    base = None
    for n in range(1, args.hosts + 1):
        procs = [
            ProcessEngine(cfg, ecfg, param_seed=i, platform="cpu")
            for i in range(n)
        ]
        try:
            batches = [
                make_requests(args.requests, base_id=1000 * i)
                for i in range(n)
            ]
            for p, batch in zip(procs, batches):
                for r in batch:
                    p.submit(r)
            t0 = time.perf_counter()
            for p in procs:
                p.run_async()
            results = {}
            for p in procs:
                results.update(p.wait_run())
            wall = time.perf_counter() - t0
        finally:
            for p in procs:
                p.close()
        tokens = sum(len(v) for v in results.values())
        tps = tokens / wall
        if base is None:
            base = tps
        # On a machine with >= n cores, scaling_efficiency is the real
        # weak-scaling number. On fewer cores the n host processes time-slice
        # the same silicon and the honest quantity is aggregate_retention:
        # how much total throughput survives n-fold oversubscription (1.0 =
        # perfect work conservation). cpus is emitted so a reader can tell
        # which regime a record is from.
        print(json.dumps({
            "hosts": n,
            "cpus": os.cpu_count(),
            "tokens": tokens,
            "wall_s": round(wall, 3),
            "tokens_per_s": round(tps, 1),
            "scaling_efficiency_vs_1host": round(tps / (base * n), 3),
            "aggregate_retention_vs_1host": round(tps / base, 3),
        }))


if __name__ == "__main__":
    main()
