"""Isolated 8-bit->bf16 convert-chain throughput (weak-#4 reconciliation).

RESULTS.md r3 attributed fp8 decode's 0.61x-of-bf16 to the e4m3 convert
chain; round 4 then built e5m2's ~6-op shift-only chain to undercut
e4m3-magic's ~8 ops — and they measured IDENTICAL (50.5k vs 50.2k tok/s).
Either the chain cost is not arithmetic-bound (scheduling / VMEM store
structure), or the chain was never the decode bottleneck at all.

This probe times each chain IN ISOLATION: one Pallas kernel converts a
resident (H, page*S, D)-shaped int8/e4m3/e5m2 block to bf16 (the exact
`_convert` chains the decode kernel runs) plus a trivial consume, chained
CHAIN times per kernel call with a data dependency. Per-element cost =
(t(chain) - t(copy)) / CHAIN / numel. If e4m3-magic == e5m2 == int8-astype
here too, the chains are NOT throughput-bound and the decode gap must be
structural (scratch stores / scheduling); if they differ here but not in
the kernel, the kernel hides the chain behind something slower.

Usage: python scripts/convert_probe.py [--out benchmarks/results/convert_probe_r05.json]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

from flashattention_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from flashattention_tpu.ops.pallas_paged import (
    _fp8_e4m3_to_bf16_bits,
    _fp8_e5m2_to_bf16_bits,
)

H, ROWS, D = 8, 256, 128  # the merged decode step's scratch plane (pps=4)
CHAIN = 32

CASES = {
    # name: (payload dtype, convert fn)
    "copy_bf16": (jnp.bfloat16, lambda x: x),
    "int8_astype": (jnp.int8, lambda x: x.astype(jnp.bfloat16)),
    "e4m3_magic": (jnp.float8_e4m3fn, _fp8_e4m3_to_bf16_bits),
    "e5m2_shift": (jnp.float8_e5m2, _fp8_e5m2_to_bf16_bits),
    "e4m3_astype": (jnp.float8_e4m3fn, lambda x: x.astype(jnp.bfloat16)),
}


def make_loop(name):
    dtype, fn = CASES[name]

    def kernel(x_ref, o_ref):
        # Each iteration converts a DIFFERENT row-slice of the (4x-tall)
        # payload buffer (offset varies with the loop index), so Mosaic
        # cannot hoist the convert out of the loop; the accumulator fold
        # stops DCE.
        acc = jnp.zeros((8, 128), jnp.float32)

        def body(i, acc):
            # Offset depends on the ACCUMULATOR (never-true predicate, but
            # the compiler can't prove it), so iterations can be neither
            # unroll-CSE'd to 4 hoisted converts (the first revision's
            # failure: negative two-point fits, queue18b) nor reordered.
            bump = jnp.where(acc[0, 0] > 1e30, 1, 0).astype(jnp.int32)
            off = pl.multiple_of(((i + bump) % 4) * ROWS, ROWS)
            f = fn(x_ref[:, pl.ds(off, ROWS), :]).astype(jnp.float32)
            return acc + f[0, :8, :128] + i.astype(jnp.float32) * 1e-9

        o_ref[...] = lax.fori_loop(0, CHAIN, body, acc)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def loop(n, x):
        def body(i, o):
            return f(x) + o[:1, :1] * 1e-9

        return lax.fori_loop(0, n, body, jnp.zeros((8, 128), jnp.float32))

    return loop


def two_point(loop, x, i1, i2, trials=3):
    best = {i1: float("inf"), i2: float("inf")}
    for _ in range(trials):
        for iters in (i1, i2):
            t0 = time.perf_counter()
            out = loop(jnp.int32(iters), x)
            np.asarray(out).ravel()[:4]
            best[iters] = min(best[iters], time.perf_counter() - t0)
    return (best[i2] - best[i1]) / (i2 - i1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/convert_probe_r05.json")
    args = ap.parse_args()

    numel = H * ROWS * D
    loops = {}
    for name, (dtype, _) in CASES.items():
        if dtype == jnp.int8:
            x = jax.random.randint(
                jax.random.key(0), (H, 4 * ROWS, D), -127, 128, jnp.int32
            ).astype(jnp.int8)
        else:
            x = jax.random.normal(
                jax.random.key(0), (H, 4 * ROWS, D), jnp.float32
            ).astype(dtype)
        loops[name] = (make_loop(name), x)
        loops[name][0](jnp.int32(2), x)
        print(f"compiled {name}", flush=True)

    rows = {}
    t_copy = None
    for name, (loop, x) in loops.items():
        t = two_point(loop, x, 20, 520)
        per_elem_ns = t / CHAIN / numel * 1e9
        rows[name] = {"t_call_us": round(t * 1e6, 2),
                      "per_elem_ns": round(per_elem_ns, 4)}
        if name == "copy_bf16":
            t_copy = t
        else:
            rows[name]["net_per_elem_ns"] = round(
                (t - t_copy) / CHAIN / numel * 1e9, 4
            )
        print(name, rows[name], flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()
