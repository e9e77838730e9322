"""Ablation study of the forward kernel's cost structure on the real chip.

Each variant strips one piece of the online-softmax pipeline so the delta
isolates its cost. Timing: two-point overhead subtraction over ONE jitted
fori_loop with a TRACED trip count (bench.py docstring — per-dispatch tunnel
overhead is 0.4-1.7 s and would swamp a fixed short loop).
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAT_ABLATE_DIM switches the whole study's head dim (round 5: the d=64
# cell runs at ~45% of its matmul ceiling and the suspect is VPU/MXU
# serialization — the twostep/mm_only variants at D=64 attribute it).
B, H, N = 1, 8, 8192
D = int(os.environ.get("FAT_ABLATE_DIM", "128"))
FWD_FLOPS = 4 * B * H * N * N * D


def make_fwd(block_q, block_k, mode):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ik = pl.program_id(3)
        n_kv = pl.num_programs(3)

        @pl.when(ik == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mode != "noscale":
            s = s * jnp.float32(D ** -0.5)

        if mode == "mm_only":
            p = s
        elif mode == "no_max":
            p = jnp.exp(s)
            l_scr[...] += jnp.sum(p, axis=1, keepdims=True)
        elif mode == "no_exp":
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = (s - m_next[:, :1]) * 1.0001  # exp replaced by cheap mul
            l_scr[...] = alpha * l_prev_sum(l_scr, alpha, p)
            m_scr[...] = m_next
        else:  # baseline / noscale
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next

        v = v_ref[0, 0]
        if mode in ("baseline", "noscale", "no_exp"):
            alpha2 = m_scr[...][:, :1] * 0.0 + 1.0 if mode == "no_exp" else None
        if mode == "mm_only" or mode == "no_max":
            acc_scr[...] += jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
        else:
            m_prev2 = m_scr[...]
            acc_scr[...] = acc_scr[...] * jnp.exp(
                m_prev2[:, :1] - m_prev2[:, :1]
            ) + jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)

        @pl.when(ik == n_kv - 1)
        def _():
            if mode == "mm_only":
                o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)
            else:
                l = l_scr[:, :1]
                l = jnp.where(l == 0.0, 1.0, l)
                o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    def l_prev_sum(l_scr, alpha, p):
        return l_scr[...] + jnp.sum(p, axis=1, keepdims=True)

    grid = (B, H, N // block_q, N // block_k)

    def call(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return call


def bench(fn, q, k, v, label):
    @jax.jit
    def loop(n, q_, k_, v_):
        def body(i, o):
            return fn(o.astype(q_.dtype), k_, v_)
        return lax.fori_loop(0, n, body, q_)

    def run(iters):
        t0 = time.perf_counter()
        out = loop(jnp.int32(iters), q, k, v)
        _ = np.asarray(out[0, 0, 0, :8])
        return time.perf_counter() - t0

    run(2)  # compile (one executable; the trip count is a runtime arg)
    i1, i2 = 30, 330
    best = {i1: float("inf"), i2: float("inf")}
    for _ in range(3):
        for iters in (i1, i2):
            best[iters] = min(best[iters], run(iters))
    t_iter = (best[i2] - best[i1]) / (i2 - i1)
    print(f"{label:40s} {t_iter*1e3:8.3f} ms  {FWD_FLOPS/t_iter/1e12:6.1f} "
          f"TFLOP/s", flush=True)


def make_fwd_bf16exp(block_q, block_k):
    """exp computed on bf16 scores — halves VPU bytes for the transcendental."""
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ik = pl.program_id(3)
        n_kv = pl.num_programs(3)

        @pl.when(ik == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(D ** -0.5)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp((s - m_next[:, :1]).astype(jnp.bfloat16))
        l_scr[...] = alpha * l_scr[...] + jnp.sum(
            p.astype(jnp.float32), axis=1, keepdims=True
        )
        m_scr[...] = m_next
        v = v_ref[0, 0]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )

        @pl.when(ik == n_kv - 1)
        def _():
            l = l_scr[:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    grid = (B, H, N // block_q, N // block_k)

    def call(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return call


def make_fwd_twostep(block_q, block_k, halves=2):
    """One grid step per (bq, bk) block, processed as ``halves`` sequential
    online-softmax sub-updates — each half's QK^T is independent of the
    previous half's softmax, giving the scheduler MXU/VPU overlap without
    extra grid steps."""
    sub = block_k // halves

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ik = pl.program_id(3)
        n_kv = pl.num_programs(3)

        @pl.when(ik == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        for hh in range(halves):
            k = k_ref[0, 0, hh * sub:(hh + 1) * sub, :]
            v = v_ref[0, 0, hh * sub:(hh + 1) * sub, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * jnp.float32(D ** -0.5)
            m_prev = m_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
            m_scr[...] = m_next
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

        @pl.when(ik == n_kv - 1)
        def _():
            l = l_scr[:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    grid = (B, H, N // block_q, N // block_k)

    def call(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return call


def make_fwd_kt(block_q, block_k):
    """K fed pre-transposed as (B, H, D, N) so QK^T needs no operand swap."""
    def kernel(q_ref, kt_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ik = pl.program_id(3)
        n_kv = pl.num_programs(3)

        @pl.when(ik == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        kt = kt_ref[0, 0]  # (D, block_k)
        s = jax.lax.dot(q, kt, preferred_element_type=jnp.float32)
        s = s * jnp.float32(D ** -0.5)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, 0]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

        @pl.when(ik == n_kv - 1)
        def _():
            l = l_scr[:, :1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)

    grid = (B, H, N // block_q, N // block_k)

    def call(q, k, v):
        kt = jnp.swapaxes(k, 2, 3)  # one-time HBM transpose outside the loop
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, D, block_k), lambda b, h, i, j: (b, h, 0, j)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(q, kt, v)

    return call


def main():
    mode = sys.argv[1]
    bq, bk = int(sys.argv[2]), int(sys.argv[3])
    from flashattention_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    q = jax.random.normal(jax.random.key(0), (B, H, N, D), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, N, D), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, N, D), dtype=jnp.bfloat16)
    try:
        if mode in ("prod", "stages1"):
            from flashattention_tpu.ops.pallas_attn import pallas_attention
            st = 1 if mode == "stages1" else 2
            fn = lambda q_, k_, v_: pallas_attention(
                q_, k_, v_, block_q=bq, block_k=bk, stages=st
            )[0]
        elif mode == "jaxfa":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as jax_fa,
            )
            fn = lambda q_, k_, v_: jax_fa(q_, k_, v_, causal=False, sm_scale=D ** -0.5)
        elif mode == "bf16exp":
            fn = make_fwd_bf16exp(bq, bk)
        elif mode == "kt":
            fn = make_fwd_kt(bq, bk)
        elif mode.startswith("twostep"):
            halves = int(mode[len("twostep"):] or 2)
            fn = make_fwd_twostep(bq, bk, halves)
        else:
            fn = make_fwd(bq, bk, mode)
        bench(fn, q, k, v, f"{mode} bq={bq} bk={bk}")
    except Exception as e:
        print(f"{mode} bq={bq} bk={bk} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
