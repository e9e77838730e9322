"""Perf probe: our Pallas kernels vs jax stock flash attention vs matmul SOL.

Chained timing (tunnel-safe, see .claude/skills/verify/SKILL.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, trials=3, chain_idx=0):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:8]
    best = float("inf")
    for _ in range(trials):
        a = list(args)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*a)
            a[chain_idx] = jax.tree_util.tree_leaves(o)[0]
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:8]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    b, h, n, d = 1, 8, 8192, 128
    q = jax.random.normal(jax.random.key(0), (b, h, n, d), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, n, d), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, n, d), dtype=jnp.bfloat16)
    fwd_flops = 4 * b * h * n * n * d

    # Matmul speed of light: same FLOP count in one big matmul chain
    m = 8192
    a0 = jax.random.normal(jax.random.key(3), (m, m), dtype=jnp.bfloat16)
    b0 = jax.random.normal(jax.random.key(4), (m, m), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x, y: jnp.dot(x, y).astype(jnp.bfloat16))
    t = timeit(mm, a0, b0)
    print(f"matmul {m}x{m}x{m}: {t*1e3:.3f} ms  {2*m**3/t/1e12:.1f} TFLOP/s")

    from flashattention_tpu.ops.pallas_attn import pallas_attention
    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    for causal in (False, True):
        f = jax.jit(lambda q_, k_, v_, c=causal: pallas_attention(q_, k_, v_, causal=c)[0])
        t = timeit(f, q, k, v)
        eff_flops = fwd_flops / (2 if causal else 1)
        print(f"ours fwd causal={causal}: {t*1e3:.3f} ms  {eff_flops/t/1e12:.1f} TFLOP/s")

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_fa,
        BlockSizes,
    )

    pass
    for causal in (False, True):
        f = jax.jit(lambda q_, k_, v_, c=causal: jax_fa(q_, k_, v_, causal=c, sm_scale=d ** -0.5))
        t = timeit(f, q, k, v)
        eff_flops = fwd_flops / (2 if causal else 1)
        print(f"jax  fwd causal={causal}: {t*1e3:.3f} ms  {eff_flops/t/1e12:.1f} TFLOP/s")

    # backward: ours
    def _loss(t3):
        o, _ = pallas_attention(t3[0], t3[1], t3[2])
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.jit(lambda q_, k_, v_: jax.grad(_loss)((q_, k_, v_))[0])
    t = timeit(g, q, k, v)
    print(f"ours fwd+bwd: {t*1e3:.3f} ms  {3*fwd_flops/t/1e12:.1f} TFLOP/s")

    def _loss_j(t3):
        o = jax_fa(t3[0], t3[1], t3[2], causal=False, sm_scale=d ** -0.5)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gj = jax.jit(lambda q_, k_, v_: jax.grad(_loss_j)((q_, k_, v_))[0])
    t = timeit(gj, q, k, v)
    print(f"jax  fwd+bwd: {t*1e3:.3f} ms  {3*fwd_flops/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
