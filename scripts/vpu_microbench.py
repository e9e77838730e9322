"""VPU elementwise-op roofline microbench at the attention score-tile shape.

Two jobs:

1. **The VPU-roofline artifact** (VERDICT r2 item 3 alternate leg): measure
   exp / exp2 / divide / max / mul-add / tanh throughput on a resident
   (block_q, block_k) fp32 tile inside a real Pallas kernel, so the
   forward's measured fraction-of-SOL can be checked against the hardware's
   actual per-element softmax cost instead of an estimate.

2. **Softcap attribution**: softcap costs ~3.5x the whole forward kernel at
   N=4K (benchmarks/results/queue5/verify_softcap.log) and rewriting
   jnp.tanh into exp form (_mosaic_tanh, 4d588ab) did NOT collapse it —
   so the cost is the arithmetic chain itself, not a tanh lowering bug.
   This bench times each candidate chain (jnp.tanh, exp-form tanh,
   sigmoid-form, clamped odd polynomial) so the cheapest accurate one wins.

Design: one Pallas kernel holds the tile in VMEM and applies the op chain
CHAIN times back-to-back (data-dependent, so Mosaic cannot hoist or DCE);
the outer timing loop is bench.py's traced-trip-count two-point method, so
tunnel dispatch overhead cancels. Per-op cost = (t(op) - t(copy)) / CHAIN.
Every chain shares the same  -|a|  + 0.1 stabilizer (keeps values in a
bounded cycle), so deltas isolate the op under test.

Usage:  python scripts/vpu_microbench.py [--out benchmarks/results/vpu_roofline_r03.json]
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

BLOCK_Q, BLOCK_K = 512, 1024  # the shipped forward score-tile shape
CHAIN = 16


def _poly_tanh(x):
    """Clamped odd minimax-style polynomial tanh candidate (no divide).

    tanh(x) ~= x * (c1 + x2*(c3 + x2*(c5 + x2*(c7 + x2*c9)))) on |x|<=3,
    clamped to +-1 outside (tanh(3) = 0.99505; the clamp step error is
    <5e-3 absolute, i.e. capped-score error < 5e-3*softcap — inside the
    bf16 kernels' output tolerance). Coefficients are the [0,3] least-
    squares fit used by several public fast-tanh kernels.
    """
    xc = jnp.clip(x, -3.0, 3.0)
    x2 = xc * xc
    p = 2.45550717e-05
    p = p * x2 - 8.79282986e-04
    p = p * x2 + 1.24239347e-02
    p = p * x2 - 8.83395652e-02
    p = p * x2 + 4.67435056e-01
    p = p * x2 + 9.99292723e-01  # odd poly in xc
    return xc * p


CHAINS = {
    # name -> op applied to t = -|a| (t in (-1.1, 0]); result + 0.1 = next a
    "copy": lambda t: t,                          # baseline: abs/neg/add only
    "muladd": lambda t: t * 1.000113 + 1e-3,
    "mul4": lambda t: ((t * 1.0001) * 0.9999) * (t * 0.5) * 1.0003,
    "max": lambda t: jnp.maximum(t, -0.777),
    "exp": jnp.exp,
    "exp2": jnp.exp2,
    "div": lambda t: 2.0 / (t - 1.9),
    "rsqrt": lambda t: lax.rsqrt(1.7 - t),
    "log": lambda t: jnp.log(1.7 - t),
    "tanh_jnp": jnp.tanh,
    "tanh_expform": lambda t: 1.0 - 2.0 / (jnp.exp(2.0 * t) + 1.0),
    "tanh_sigmoid": lambda t: 2.0 * jax.nn.sigmoid(2.0 * t) - 1.0,
    "tanh_poly": _poly_tanh,
    # the two full softcap chains as deployed (cap=10, pre-scale + rescale)
    "softcap_expform": lambda t: 10.0 * (
        1.0 - 2.0 / (jnp.exp(2.0 * (t * 0.1)) + 1.0)
    ),
    "softcap_poly": lambda t: 10.0 * _poly_tanh(t * 0.1),
}

if hasattr(pl, "reciprocal"):
    # pl.reciprocal(approx=True) is the documented fast VPU reciprocal —
    # candidate replacement for the divide in the exp-form tanh chain.
    CHAINS["recip_approx"] = lambda t: pl.reciprocal(1.7 - t, approx=True)
    CHAINS["softcap_expform_recip"] = lambda t: 10.0 * (
        1.0 - 2.0 * pl.reciprocal(jnp.exp(2.0 * (t * 0.1)) + 1.0,
                                  approx=True)
    )


def make_kernel(name):
    op = CHAINS[name]

    def kernel(x_ref, o_ref):
        a = x_ref[...]

        def body(i, a):
            return op(-jnp.abs(a)) + 0.1

        o_ref[...] = lax.fori_loop(0, CHAIN, body, a)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BLOCK_Q, BLOCK_K), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def loop(n, a0):
        def body(i, a):
            return f(a)

        return lax.fori_loop(0, n, body, a0)

    return loop


def two_point(loop, a0, i1, i2, trials=3):
    best = {i1: float("inf"), i2: float("inf")}
    for _ in range(trials):
        for iters in (i1, i2):
            t0 = time.perf_counter()
            out = loop(jnp.int32(iters), a0)
            np.asarray(out).ravel()[:4]
            best[iters] = min(best[iters], time.perf_counter() - t0)
    return (best[i2] - best[i1]) / (i2 - i1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--lens", type=int, nargs=2, default=(50, 1050))
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (interpret mode) for smoke tests; the "
                    "env's sitecustomize would otherwise grab the TPU even "
                    "under JAX_PLATFORMS=cpu")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    a0 = jax.random.normal(jax.random.key(0), (BLOCK_Q, BLOCK_K), jnp.float32)
    numel = BLOCK_Q * BLOCK_K
    rows = {}
    loops = {}
    for name in CHAINS:
        loops[name] = make_kernel(name)
        loops[name](jnp.int32(2), a0)  # compile
        print(f"compiled {name}", flush=True)
    t_copy = None
    for name in CHAINS:
        t_iter = two_point(loops[name], a0, *args.lens)
        ns_elt = t_iter / (CHAIN * numel) * 1e9
        rows[name] = {"t_iter_us": round(t_iter * 1e6, 2),
                      "ns_per_element_chain": round(ns_elt, 5)}
        if name == "copy":
            t_copy = t_iter
        if t_copy is not None:
            delta = (t_iter - t_copy) / (CHAIN * numel) * 1e9
            rows[name]["op_ns_per_element"] = round(delta, 5)
            if delta > 0:
                rows[name]["op_gops"] = round(1.0 / delta, 2)
        print(name, rows[name], flush=True)

    result = {
        "tile": [BLOCK_Q, BLOCK_K],
        "chain_len": CHAIN,
        "dtype": "float32",
        "method": "pallas resident-VMEM chained ops; outer traced-trip-count "
                  "two-point loop (bench.py method); op cost = delta vs copy",
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
