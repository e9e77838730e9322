"""Block-size tuning sweep for the Pallas attention kernels on real TPU.

Each config runs in its own subprocess: timing many distinct compiled
programs in one process is unreliable through the axon tunnel (measured
15x swings on identical configs). Timing via chained dependencies + host
fetch (block_until_ready does not synchronize through the tunnel).

Usage:
  python scripts/tune_attention.py                 # sweep fwd
  python scripts/tune_attention.py --bwd           # sweep bwd
  python scripts/tune_attention.py --one 256 512 --causal  # single config
"""

import argparse
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(bq, bk, causal, bwd, seq, dim, heads):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flashattention_tpu.ops.pallas_attn import pallas_attention

    B, H, N, D = 1, heads, seq, dim
    q = jax.random.normal(jax.random.key(0), (B, H, N, D), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, N, D), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, N, D), dtype=jnp.bfloat16)
    fwd_flops = 4 * B * H * N * N * D

    if bwd:
        def f(q_, k_, v_):
            def loss(t):
                o, _ = pallas_attention(
                    t[0], t[1], t[2], causal=causal, block_q=bq, block_k=bk
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss)((q_, k_, v_))[0]
        flops = fwd_flops * 2.5
    else:
        def f(q_, k_, v_):
            return pallas_attention(
                q_, k_, v_, causal=causal, block_q=bq, block_k=bk
            )[0]
        flops = fwd_flops
    from jax import lax

    ITERS = 60 if not bwd else 20

    @jax.jit
    def g(q_, k_, v_):
        def body(i, acc):
            return f(acc, k_, v_).astype(q_.dtype)
        return lax.fori_loop(0, ITERS, body, q_)

    o = g(q, k, v)
    _ = np.asarray(o[0, 0, 0, :8])
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        o = g(q, k, v)
        _ = np.asarray(o[0, 0, 0, :8])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    eff = flops / (2 if causal else 1)
    print(f"RESULT bq={bq} bk={bk} causal={causal} bwd={bwd}: "
          f"{best*1e3:.3f} ms {eff/best/1e12:.1f} TFLOP/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--one", type=int, nargs=2, default=None,
                    metavar=("BQ", "BK"))
    args = ap.parse_args()

    if args.one:
        run_one(args.one[0], args.one[1], args.causal, args.bwd,
                args.seq, args.dim, args.heads)
        return

    blocks = [
        (256, 512), (256, 1024), (512, 512), (512, 1024), (512, 2048),
        (1024, 512), (1024, 1024), (2048, 512),
    ]
    for causal in (False, True):
        for bq, bk in blocks:
            if bq > args.seq or bk > args.seq:
                continue
            cmd = [sys.executable, __file__, "--one", str(bq), str(bk),
                   "--seq", str(args.seq), "--dim", str(args.dim),
                   "--heads", str(args.heads)]
            if causal:
                cmd.append("--causal")
            if args.bwd:
                cmd.append("--bwd")
            r = subprocess.run(cmd, capture_output=True, text=True)
            out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
            print(out[0] if out else
                  f"FAILED bq={bq} bk={bk} causal={causal}: "
                  f"{r.stderr.strip().splitlines()[-1][:150] if r.stderr else '?'}",
                  flush=True)


if __name__ == "__main__":
    main()
