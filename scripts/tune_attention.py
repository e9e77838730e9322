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


def matmul_sol():
    """Matmul speed-of-light reading, overhead-corrected (two-point over a
    traced-length loop — a fixed short loop reads dispatch overhead, not
    compute; see bench.py docstring). Returns TFLOP/s of a 6k bf16 matmul."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    m = 6144
    a = jax.random.normal(jax.random.key(7), (m, m), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(8), (m, m), jnp.bfloat16)

    @jax.jit
    def loop(n, a0, b0):
        def body(i, x):
            return jnp.dot(x, b0).astype(jnp.bfloat16)
        return lax.fori_loop(0, n, body, a0)

    out = loop(jnp.int32(2), a, b)
    _ = np.asarray(out).ravel()[:8]
    i1, i2 = 30, 330
    best = {i1: float("inf"), i2: float("inf")}
    for _trial in range(2):
        for iters in (i1, i2):
            t0 = _time.perf_counter()
            out = loop(jnp.int32(iters), a, b)
            _ = np.asarray(out).ravel()[:8]
            best[iters] = min(best[iters], _time.perf_counter() - t0)
    t_iter = (best[i2] - best[i1]) / (i2 - i1)
    return 2 * m**3 / t_iter / 1e12


def run_one(bq, bk, causal, bwd, seq, dim, heads):
    """Overhead-corrected timing of one (block_q, block_k) config.

    Methodology per bench.py (round-2): traced-length fori_loop, two-point
    fit; the backward loop consumes ALL grads (a dq-only carry lets XLA
    DCE the dKV kernel — the round-1 tuning-data hazard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from flashattention_tpu.ops.pallas_attn import pallas_attention
    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

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
            dq, dk, dv = jax.grad(loss)((q_, k_, v_))
            return (dq + dk + dv).astype(q_.dtype)
        flops = fwd_flops * 3.0
        i1, i2 = 10, max(110, 10 * 8192 // seq)
    else:
        def f(q_, k_, v_):
            return pallas_attention(
                q_, k_, v_, causal=causal, block_q=bq, block_k=bk
            )[0].astype(q_.dtype)
        flops = fwd_flops
        i1, i2 = 30, max(330, 30 * 8192 // seq)

    @jax.jit
    def g(n, q_, k_, v_):
        def body(i, acc):
            return f(acc, k_, v_)
        return lax.fori_loop(0, n, body, q_)

    o = g(jnp.int32(2), q, k, v)
    _ = np.asarray(o).ravel()[:8]
    best = {i1: float("inf"), i2: float("inf")}
    for _trial in range(3):
        for iters in (i1, i2):
            t0 = time.perf_counter()
            o = g(jnp.int32(iters), q, k, v)
            _ = np.asarray(o).ravel()[:8]
            best[iters] = min(best[iters], time.perf_counter() - t0)
    t_iter = (best[i2] - best[i1]) / (i2 - i1)
    eff = flops / (2 if causal else 1)
    sol = matmul_sol()
    print(f"RESULT bq={bq} bk={bk} causal={causal} bwd={bwd} seq={seq} "
          f"dim={dim}: {t_iter*1e3:.3f} ms {eff/t_iter/1e12:.1f} TFLOP/s "
          f"sol={sol:.1f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--one", type=int, nargs=2, default=None,
                    metavar=("BQ", "BK"))
    ap.add_argument("--grid", action="store_true",
                    help="sweep N x d x blocks and emit the measured spec "
                         "table for ops/specs.py (JSON lines + best-per-cell)")
    ap.add_argument("--min-sol", type=float, default=0.0,
                    help="grid mode: retry a config (up to 3x) while the "
                         "matmul SOL reading is below this (TFLOP/s); the "
                         "two-point timing made the gate mostly redundant")
    ap.add_argument("--resume", type=str, default=None,
                    help="grid mode: path to a previous grid log; cells with "
                         "a GRID line there are reused, not re-run")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="grid mode: per-cell subprocess timeout (s); remote "
                         "Mosaic compiles usually land in 30s-10min, so a "
                         "tighter budget trades tail cells for wall-clock")
    ap.add_argument("--attempts", type=int, default=3,
                    help="grid mode: retries per cell before giving up")
    ap.add_argument("--seqs", type=str, default="2048,8192,16384",
                    help="grid mode: comma-separated seq lengths to sweep "
                         "(resumed cells outside the list still score)")
    args = ap.parse_args()

    if args.one:
        run_one(args.one[0], args.one[1], args.causal, args.bwd,
                args.seq, args.dim, args.heads)
        return

    if args.grid:
        grid_main(args)
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


def _parse_result(line):
    import re

    m = re.search(
        r"RESULT bq=(\d+) bk=(\d+) causal=(\w+) bwd=(\w+) seq=(\d+) "
        r"dim=(\d+): ([\d.]+) ms ([\d.]+) TFLOP/s sol=([\d.]+)", line
    )
    if not m:
        return None
    return dict(
        bq=int(m[1]), bk=int(m[2]), causal=m[3] == "True", bwd=m[4] == "True",
        seq=int(m[5]), dim=int(m[6]), ms=float(m[7]), tflops=float(m[8]),
        sol=float(m[9]),
    )


def grid_main(args):
    """Sweep N x d x candidate blocks; retry unhealthy windows (SOL gate);
    print JSON lines + the best-(bq, bk) per (N, d) cell for
    ops/specs.py:_MEASURED_BLOCKS. Forward and fwd+bwd both run; the cell
    winner maximizes fwd + 2*bwd weighted TFLOP/s (training mix)."""
    import json

    seqs = tuple(int(s) for s in args.seqs.split(","))
    dims = (64, 128, 256)
    blocks = [(256, 512), (512, 1024), (1024, 1024)]
    # Backward compiles for these combos are PATHOLOGICAL on the remote
    # Mosaic service (measured 2026-08-17: >15 min compile hang or silent
    # process death, deterministic across 3+ attempts each; every other
    # combo compiles in seconds-minutes). Skip them: a block shape that
    # cannot compile in reasonable time loses the sweep by definition.
    doomed_bwd = {(1024, 1024, 128), (1024, 1024, 256), (256, 512, 256)}
    done = _load_resume(args.resume) if args.resume else {}
    results = []
    for seq in seqs:
        for dim in dims:
            for bq, bk in blocks:
                if bq > seq or bk > seq:
                    continue
                for bwd in (False, True):
                    if bwd and (bq, bk, dim) in doomed_bwd:
                        print(f"SKIP bwd bq={bq} bk={bk} dim={dim} "
                              f"(pathological compile)", flush=True)
                        continue
                    prev = done.get((seq, dim, bq, bk, bwd))
                    if prev is not None:
                        results.append(prev)
                        print("GRID " + json.dumps(prev) + "  # resumed",
                              flush=True)
                        continue
                    rec = None
                    for attempt in range(args.attempts):
                        cmd = [sys.executable, __file__, "--one", str(bq),
                               str(bk), "--seq", str(seq), "--dim", str(dim),
                               "--heads", str(args.heads)]
                        if bwd:
                            cmd.append("--bwd")
                        try:
                            r = subprocess.run(cmd, capture_output=True,
                                               text=True,
                                               timeout=args.timeout)
                            tail = "\n".join(
                                r.stderr.strip().splitlines()[-3:]
                            ) or "?"
                        except subprocess.TimeoutExpired:
                            r, tail = None, "timeout 1800s (tunnel wedge?)"
                        out = [l for l in r.stdout.splitlines()
                               if l.startswith("RESULT")] if r else []
                        rec = _parse_result(out[0]) if out else None
                        if rec is None:
                            # Subprocess crash/hang (tunnel hiccups are
                            # common) — log the real tail and retry.
                            print(f"FAILED (attempt {attempt}) bq={bq} "
                                  f"bk={bk} seq={seq} dim={dim} bwd={bwd}: "
                                  f"{tail[-300:]}", flush=True)
                            time.sleep(15)
                            continue
                        if rec["sol"] >= args.min_sol:
                            break
                        print(f"RETRY (sol={rec['sol']:.1f} < "
                              f"{args.min_sol}) bq={bq} bk={bk} seq={seq} "
                              f"dim={dim} bwd={bwd}", flush=True)
                        time.sleep(20)
                    if rec:
                        results.append(rec)
                        print("GRID " + json.dumps(rec), flush=True)

    # Two-point fits occasionally glitch (overhead shifted between the two
    # lengths): an implied rate above the chip's physical peak is impossible
    # — drop such records before scoring (bench.py applies the same cap).
    n_raw = len(results)
    results = [r for r in results
               if r["tflops"] <= 197 * 1.05 and r["sol"] <= 197 * 1.05]
    if len(results) != n_raw:
        print(f"# dropped {n_raw - len(results)} fit-glitch records "
              f"(implied rate > physical peak)")

    print("\n# best blocks per (seq, dim), fwd + 2*bwd weighted:")
    table = {}
    for seq in sorted({r["seq"] for r in results}):
        for dim in dims:
            cell = [r for r in results if r["seq"] == seq and r["dim"] == dim]
            scores = {}
            for bq, bk in blocks:
                fwd = [r["tflops"] for r in cell
                       if (r["bq"], r["bk"]) == (bq, bk) and not r["bwd"]]
                bwdv = [r["tflops"] for r in cell
                        if (r["bq"], r["bk"]) == (bq, bk) and r["bwd"]]
                if fwd and bwdv:
                    scores[(bq, bk)] = fwd[0] + 2 * bwdv[0]
            if scores:
                best = max(scores, key=scores.get)
                table[(seq, dim)] = best
                print(f"    ({seq}, {dim}): {best},  # score "
                      f"{scores[best]:.1f} TFLOP/s-wtd")
    print("# paste into ops/specs.py _MEASURED_BLOCKS (bucket keys)")


def _load_resume(path):
    """Parse GRID json lines from a previous grid log."""
    import json

    done = {}
    try:
        with open(path) as f:
            for line in f:
                if line.startswith("GRID "):
                    rec = json.loads(line[5:])
                    key = (rec["seq"], rec["dim"], rec["bq"], rec["bk"],
                           rec["bwd"])
                    done[key] = rec
    except OSError:
        pass
    return done


if __name__ == "__main__":
    main()
