"""Benchmark sweep CLI (reference bench_compare_all.py / bench_fa*.py).

Each config runs in a fresh subprocess: timing many distinct compiled
programs in one process is unreliable through the TPU tunnel.

    python -m flashattention_tpu.bench.sweep --quick
    python -m flashattention_tpu.bench.sweep \
        --seqlens 512 1024 2048 4096 8192 16384 --dims 64 128 256 \
        --algos fa2 fa3 --directions forward backward --plot
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

from flashattention_tpu.bench.harness import (
    BenchRecord,
    attention_flops,
    benchmark_call,
    console_table,
    peak_tflops,
    write_results,
)


def run_config(ns) -> BenchRecord:
    import jax
    import jax.numpy as jnp

    from flashattention_tpu.ops import api

    rec = BenchRecord(
        algo=ns.algo, backend=ns.backend, direction=ns.direction,
        batch=ns.batch, heads=ns.heads, seqlen=ns.seqlen, head_dim=ns.dim,
        causal=ns.causal, dtype=ns.dtype,
    )
    try:
        dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[ns.dtype]
        kv_heads = ns.kv_heads or ns.heads
        shape = (ns.batch, ns.heads, ns.seqlen, ns.dim)
        kv_shape = (ns.batch, kv_heads, ns.seqlen, ns.dim)
        q = jax.random.normal(jax.random.key(0), shape, dtype)
        k = jax.random.normal(jax.random.key(1), kv_shape, dtype)
        v = jax.random.normal(jax.random.key(2), kv_shape, dtype)
        algo_fn = {
            "fa1": api.fa1_attention,
            "fa2": api.fa2_attention,
            "fa3": api.fa3_attention,
        }[ns.algo]
        kwargs = dict(causal=ns.causal, backend=ns.backend)
        if ns.algo == "fa3" and ns.fp8:
            kwargs["fp8"] = True
            rec.dtype = "fp8"
        if ns.dropout > 0.0:
            if ns.algo == "fa3":
                # fa3 carries dropout natively (incl. the fused FP8 kernel's
                # counter-based mask).
                kwargs["dropout_rate"] = ns.dropout
                kwargs["dropout_key"] = jax.random.key(9)
            else:
                # fa1/fa2 dispatchers keep the reference's signature (no
                # dropout arg); ride the generic entry point.
                from flashattention_tpu.ops.api import flash_attention

                def algo_fn(q_, k_, v_, causal=False, backend="auto", **_kw):
                    return flash_attention(
                        q_, k_, v_, causal=causal, backend=backend,
                        dropout_rate=ns.dropout, dropout_key=jax.random.key(9),
                    )

        if ns.direction == "forward":
            fn = jax.jit(lambda q_, k_, v_: algo_fn(q_, k_, v_, **kwargs)[0])
        else:
            def loss(t):
                o, _ = algo_fn(t[0], t[1], t[2], **kwargs)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def fn(q_, k_, v_):
                # ALL grads consumed — a dq-only carry lets XLA DCE the dKV
                # kernel (bench.py docstring, round-2 finding). dk/dv may
                # carry fewer heads under GQA; reduce them into dq's shape.
                dq, dk, dv = jax.grad(loss)((q_, k_, v_))
                return dq + jnp.sum(dk + dv, axis=1, keepdims=True).astype(
                    dq.dtype
                )

        rec.mean_ms, rec.pstdev_ms, compiled_mem = benchmark_call(
            fn, (q, k, v)
        )
        from flashattention_tpu.bench.harness import device_peak_memory_mb

        # Prefer runtime stats (reference max_memory_allocated analogue);
        # through the axon tunnel those return nothing, so fall back to
        # the compiled executable's exact buffer-assignment peak.
        rec.peak_mem_mb = device_peak_memory_mb()
        rec.mem_source = "device_stats" if rec.peak_mem_mb else ""
        if not rec.peak_mem_mb and compiled_mem:
            rec.peak_mem_mb = round(compiled_mem, 1)
            rec.mem_source = "xla_compiled"
        flops = attention_flops(
            ns.batch, ns.heads, ns.seqlen, ns.dim,
            direction="both" if ns.direction == "backward" else "forward",
            causal=ns.causal,
        )
        rec.tflops = flops / (rec.mean_ms / 1e3) / 1e12
        rec.roofline_frac = rec.tflops / peak_tflops(
            {"fp32": "float32", "fp8": "fp8"}.get(rec.dtype, "bfloat16")
        )
    except Exception as e:  # OOM-catch-and-continue (bench_utils.py:227-229)
        rec.status = "oom" if "RESOURCE_EXHAUSTED" in str(e) else "failed"
        rec.error = f"{type(e).__name__}: {e}"[:200]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlens", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096, 8192, 16384])
    ap.add_argument("--dims", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--algos", nargs="+", default=["fa2"],
                    choices=["fa1", "fa2", "fa3"])
    ap.add_argument("--backends", nargs="+", default=["pallas"])
    ap.add_argument("--directions", nargs="+", default=["forward"],
                    choices=["forward", "backward"])
    ap.add_argument("--dtypes", nargs="+", default=["bf16"],
                    choices=["bf16", "fp32"])
    ap.add_argument("--causal", choices=["true", "false", "both"],
                    default="both")
    ap.add_argument("--fp8", action="store_true",
                    help="fa3 runs its fp8 path")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="attention dropout rate (pallas counter-based)")
    ap.add_argument("--kv-heads", type=int, default=None,
                    help="GQA: number of KV heads (< --heads)")
    ap.add_argument("--out", default="benchmarks/results")
    ap.add_argument("--tag", default="sweep")
    ap.add_argument("--cell-timeout", type=float, default=1500.0,
                    help="per-config subprocess timeout (s): a wedged "
                         "tunnel window costs one cell, not the sweep")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plot", action="store_true")
    # internal: run one config in-process
    ap.add_argument("--one", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--algo", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--backend", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--direction", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--dtype", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--seqlen", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--dim", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--causal-one", action="store_true", help=argparse.SUPPRESS)
    ns = ap.parse_args()

    if ns.one:
        ns.causal = ns.causal_one
        rec = run_config(ns)
        print("RECORD " + json.dumps(rec.row()))
        return

    if ns.quick:
        ns.seqlens = [1024, 4096]
        ns.dims = [128]

    causals = {"true": [True], "false": [False], "both": [False, True]}[ns.causal]
    records = []
    for algo in ns.algos:
        for backend in ns.backends:
            for direction in ns.directions:
                for dtype in ns.dtypes:
                    for n in ns.seqlens:
                        for d in ns.dims:
                            for causal in causals:
                                cmd = [
                                    sys.executable, "-m",
                                    "flashattention_tpu.bench.sweep", "--one",
                                    "--algo", algo, "--backend", backend,
                                    "--direction", direction, "--dtype", dtype,
                                    "--seqlen", str(n), "--dim", str(d),
                                    "--batch", str(ns.batch),
                                    "--heads", str(ns.heads),
                                ]
                                if causal:
                                    cmd.append("--causal-one")
                                if ns.fp8:
                                    cmd.append("--fp8")
                                if ns.dropout:
                                    cmd += ["--dropout", str(ns.dropout)]
                                if ns.kv_heads:
                                    cmd += ["--kv-heads", str(ns.kv_heads)]
                                try:
                                    r = subprocess.run(
                                        cmd, capture_output=True, text=True,
                                        timeout=ns.cell_timeout,
                                    )
                                except subprocess.TimeoutExpired:
                                    records.append(BenchRecord(
                                        algo=algo, backend=backend,
                                        direction=direction, batch=ns.batch,
                                        heads=ns.heads, seqlen=n, head_dim=d,
                                        causal=causal, dtype=dtype,
                                        status="failed",
                                        error="cell timeout (wedged window "
                                              "or pathological compile)",
                                    ))
                                    print(console_table(
                                        records[-1:]).splitlines()[-1],
                                        flush=True)
                                    continue
                                line = [l for l in r.stdout.splitlines()
                                        if l.startswith("RECORD ")]
                                if line:
                                    records.append(
                                        BenchRecord(**json.loads(line[0][7:]))
                                    )
                                else:
                                    err = (r.stderr.strip().splitlines() or ["?"])[-1]
                                    records.append(BenchRecord(
                                        algo=algo, backend=backend,
                                        direction=direction, batch=ns.batch,
                                        heads=ns.heads, seqlen=n, head_dim=d,
                                        causal=causal, dtype=dtype,
                                        status="failed", error=err[:200],
                                    ))
                                print(console_table(records[-1:]).splitlines()[-1],
                                      flush=True)

    print()
    print(console_table(records))
    jpath, cpath = write_results(records, ns.out, ns.tag)
    print(f"\nwrote {jpath} and {cpath}")
    if ns.plot:
        from flashattention_tpu.bench.plotting import (
            plot_mixed_figure,
            plot_sweep,
            render_ablation_table,
        )

        fig_path = plot_sweep(records, ns.out, ns.tag)
        print(f"wrote {fig_path}")
        mixed_path = plot_mixed_figure(records, ns.out, ns.tag)
        print(f"wrote {mixed_path}")
        for ext, p in render_ablation_table(records, ns.out, ns.tag).items():
            print(f"wrote {p} ({ext})")


if __name__ == "__main__":
    main()
