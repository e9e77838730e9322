"""Which matmul dimension at 64 costs MXU throughput? (d=64 schedule design)

The reference's spec table leads with d=64 (src/fa1/spec.py:9-12) but this
repo's d=64 forward runs at 74-87 TF ~= 40% of the d=128 peak (sweep_r04).
Before designing a d=64 schedule we need the HARDWARE cost model: the MXU
is a 128x128 systolic array — but which operand dimension of a (m,k)x(k,n)
matmul tolerates 64 and which pads to 128 (halving throughput)?

Hypothesis driving the candidate fix: the m (streamed-rows) dimension is
free down to the sublane multiple, while k and/or n pad. If so, every
"bad" attention matmul at d=64 can be re-associated so 64 lands on m:

    fwd:  S = Q K^T         (m=bq, k=64, n=bk)   <- k=64
          O^T = V^T P^T     (m=64, k=bk, n=bq)   instead of P V (n=64)
    bwd:  dS = dO V^T       (k=64)
          dV^T = dO^T P     (m=64)               instead of P^T dO (n=64)
          dQ^T = K^T dS^T   (m=64)               instead of dS K  (n=64)
          dK^T = Q^T dS     (m=64)               instead of dS^T Q (n=64)

Timing: bench.py's two-point traced-trip-count method (the only honest
method through the axon tunnel — CLAUDE.md).

Usage: python scripts/mm_dims_probe.py [--out benchmarks/results/mm_dims_r05.json]
"""

import argparse
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

N = 4096  # big-dim size: large enough to amortize, small enough to iterate


def make_loop(m, k, n):
    """One jitted fori_loop with traced trip count timing C = A @ B with a
    data-dependent carry (A is perturbed by C's first column block so the
    matmul cannot be hoisted)."""

    @jax.jit
    def loop(iters, a, b):
        def body(i, a):
            c = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
            # fold c back into a (shape-preserving, cheap): keeps the
            # chain data-dependent without a second matmul.
            return (a + c[:, :1].astype(jnp.bfloat16) * 1e-6).astype(
                jnp.bfloat16
            )

        return lax.fori_loop(0, iters, body, a)

    return loop


def two_point(loop, args, i1, i2, trials=3):
    best = {i1: float("inf"), i2: float("inf")}
    for _ in range(trials):
        for iters in (i1, i2):
            t0 = time.perf_counter()
            out = loop(jnp.int32(iters), *args)
            np.asarray(out).ravel()[:4]
            best[iters] = min(best[iters], time.perf_counter() - t0)
    return (best[i2] - best[i1]) / (i2 - i1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/mm_dims_r05.json")
    args = ap.parse_args()

    cases = {
        # name: (m, k, n)
        "square_4k": (N, N, N),
        "m64": (64, N, N),
        "m128": (128, N, N),
        "k64": (N, 64, N),
        "k128": (N, 128, N),
        "n64": (N, N, 64),
        "n128": (N, N, 128),
        # attention-shaped sanity points (bq=512, bk=1024)
        "qk_d64": (512, 64, 1024),
        "qk_d128": (512, 128, 1024),
        "pv_d64": (512, 1024, 64),
        "pvT_d64": (64, 1024, 512),  # the transposed-output candidate
    }
    rows = {}
    loops = {}
    key = jax.random.key(0)
    for name, (m, k, n) in cases.items():
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        loops[name] = (make_loop(m, k, n), (a, b), 2 * m * k * n)
        loops[name][0](jnp.int32(2), a, b)  # compile
        print(f"compiled {name}", flush=True)

    # Small matmuls need longer loops for a stable fit.
    for name, (loop, ab, flops) in loops.items():
        m, k, n = cases[name]
        small = flops < 2 * N * N * 256
        lens = (50, 2050) if small else (20, 520)
        t = two_point(loop, ab, *lens)
        tf = flops / t / 1e12
        rows[name] = {"mkn": [m, k, n], "t_us": round(t * 1e6, 2),
                      "tflops": round(tf, 1)}
        print(f"{name:10s} ({m:5d},{k:5d},{n:5d}): {tf:8.1f} TF", flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"out": args.out}))


if __name__ == "__main__":
    main()
