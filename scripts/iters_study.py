"""Quantify per-dispatch overhead in fori_loop timing: t(ITERS) = ovh/ITERS + t_iter."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, H, N, D = 1, 8, 8192, 128
FWD_FLOPS = 4 * B * H * N * N * D


def study(fn_one, args, label, iters_list=(5, 20, 80)):
    for iters in iters_list:
        @jax.jit
        def loop(a0, *rest, n=iters):
            def body(i, o):
                return fn_one(o, *rest)
            return lax.fori_loop(0, n, body, a0)

        out = loop(*args)
        _ = np.asarray(out).ravel()[:8]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(*args)
            _ = np.asarray(out).ravel()[:8]
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{label} iters={iters:3d}: {best*1e3:8.3f} ms/iter", flush=True)


def main():
    q = jax.random.normal(jax.random.key(0), (B, H, N, D), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, N, D), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, N, D), dtype=jnp.bfloat16)

    m = 8192
    a0 = jax.random.normal(jax.random.key(3), (m, m), dtype=jnp.bfloat16)
    b0 = jax.random.normal(jax.random.key(4), (m, m), dtype=jnp.bfloat16)
    study(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        (a0, b0), "matmul8k",
    )

    from flashattention_tpu.ops.pallas_attn import pallas_attention

    study(
        lambda o, k_, v_: pallas_attention(o, k_, v_)[0].astype(o.dtype),
        (q, k, v), "fa_fwd",
    )


if __name__ == "__main__":
    main()
