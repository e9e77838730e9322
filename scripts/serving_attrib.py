"""Serving decode-step attribution: where does the step time go?

Times the SAME jitted decode loop as scripts/bench_serving.py but with the
honest two-point method (traced-trip-count fori_loop, two lengths, min over
trials, t_iter from the difference — cancels the 0.4-1.7 s per-dispatch
tunnel overhead bench_serving's single-dispatch timing bakes in) across
component-isolation variants:

  full      the shipped step (merged paged kernel)
  flat      FAT_PAGED_MERGED=0 (flat paged kernel)
  xla       use_pallas=False (XLA gather executor)
  noattn    paged attention replaced by identity (q passthrough)
  noappend  append_to_pages replaced by identity (cache passthrough)
  dus       append via per-batch dynamic_update_slice (T=1 fast path)
  uniq      append scatter with unique_indices + promise_in_bounds
  pallas    in-place Pallas append kernel (FAT_APPEND_PALLAS=1)

dus/uniq test the queue8 finding: scatter-append alone costs ~0 (noattn
0.33 ms) and attention alone ~1.1 ms (noappend 1.44), but together the
step reads 4.21 ms — the scatter + pallas-consumer combination induces a
~2.8 ms/step penalty (a per-iteration cache copy by the look of the
byte math: ~671 MB of caches ~ 0.84 ms at line rate).

full-noattn ~= attention cost; full-noappend ~= append (scatter) cost.
Context: queue7's old-rev A/B confirmed VERDICT r2 weak #5 — f216024 steps
in 3.17-3.35 ms where HEAD takes 4.28-4.33 ms, while the XLA-path cost
analysis says HEAD is strictly cheaper (6.5e9 vs 17.5e9 flops) — so the
regression lives in the TPU-only Pallas/append path this probe isolates.

    python scripts/serving_attrib.py [--batch 16] [--variants full,flat,...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--page", type=int, default=256)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--i1", type=int, default=8)
    ap.add_argument("--i2", type=int, default=40)
    ap.add_argument("--variants",
                    default="full,flat,xla,noattn,noappend")
    ap.add_argument("--memdump", action="store_true",
                    help="print XLA buffer-assignment sizes per variant "
                         "instead of timing (finds defensive cache copies)")
    ns = ap.parse_args()

    from flashattention_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import flashattention_tpu.serving.engine as engine_mod
    import flashattention_tpu.ops.pallas_paged as paged_mod
    from flashattention_tpu.models.transformer import (
        TransformerConfig, init_transformer,
    )
    from flashattention_tpu.serving.paged_kv import init_paged_cache

    cfg = TransformerConfig(
        vocab_size=32000, d_model=ns.d_model, n_layers=ns.layers,
        n_heads=ns.heads, n_kv_heads=ns.heads, d_ff=4 * ns.d_model,
        max_seq_len=ns.ctx + 2 * ns.i2 * ns.trials + 64, block_size=128,
        dropout_rate=0.0, dtype=jnp.bfloat16,
    )
    b = ns.batch
    pps = -(-cfg.max_seq_len // ns.page)
    params = init_transformer(jax.random.key(0), cfg)
    pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps) + 1
    tokens0 = jnp.zeros((b, 1), jnp.int32)
    lengths0 = jnp.full((b,), ns.ctx, jnp.int32)

    def fresh_caches():
        return [
            init_paged_cache(cfg.kv_heads, b * pps + 1, ns.page, cfg.d_head,
                             dtype=cfg.dtype)
            for _ in range(cfg.n_layers)
        ]

    real_append = engine_mod.append_to_pages
    real_paged = paged_mod.pallas_paged_attention

    import dataclasses

    import jax.numpy as _jnp
    from jax import lax as _lax

    def dus_append(cache, k_new, v_new, page_indices, lengths, **kw):
        """T=1 decode append as B dynamic_update_slices inside a fori_loop
        (in-place friendly for XLA, unlike scatter?). Bench-only: no quant,
        no valid_len, no capacity mask."""
        page = cache.page_size
        pps = page_indices.shape[1]
        logical = _jnp.minimum(lengths // page, pps - 1)
        slot = lengths % page
        phys = _jnp.take_along_axis(
            page_indices, logical[:, None], axis=1)[:, 0]
        kt = k_new[:, :, 0, :].astype(cache.k_pages.dtype)  # (B, H, D)
        vt = v_new[:, :, 0, :].astype(cache.v_pages.dtype)

        def body(i, pages):
            kp, vp = pages
            kp = _lax.dynamic_update_slice(
                kp, kt[i][:, None, None, :], (0, phys[i], slot[i], 0))
            vp = _lax.dynamic_update_slice(
                vp, vt[i][:, None, None, :], (0, phys[i], slot[i], 0))
            return kp, vp

        kp, vp = _lax.fori_loop(
            0, k_new.shape[0], body, (cache.k_pages, cache.v_pages))
        return dataclasses.replace(cache, k_pages=kp, v_pages=vp)

    def uniq_append(cache, k_new, v_new, page_indices, lengths, **kw):
        """Scatter append with unique_indices + promise_in_bounds (bench-
        only: decode writes ARE unique and in range here)."""
        page = cache.page_size
        pps = page_indices.shape[1]
        logical = _jnp.minimum(lengths // page, pps - 1)
        slot = lengths % page
        phys = _jnp.take_along_axis(
            page_indices, logical[:, None], axis=1)[:, 0]
        kt = k_new[:, :, 0, :].astype(cache.k_pages.dtype).transpose(1, 0, 2)
        vt = v_new[:, :, 0, :].astype(cache.v_pages.dtype).transpose(1, 0, 2)
        kp = cache.k_pages.at[:, phys, slot, :].set(
            kt, mode="promise_in_bounds", unique_indices=True)
        vp = cache.v_pages.at[:, phys, slot, :].set(
            vt, mode="promise_in_bounds", unique_indices=True)
        return dataclasses.replace(cache, k_pages=kp, v_pages=vp)

    def setup(variant):
        """Returns (restore_fn, use_pallas) after installing the variant."""
        os.environ.pop("FAT_PAGED_MERGED", None)
        os.environ.pop("FAT_APPEND_PALLAS", None)
        engine_mod.append_to_pages = real_append
        paged_mod.pallas_paged_attention = real_paged
        use_pallas = True
        if variant == "flat":
            os.environ["FAT_PAGED_MERGED"] = "0"
        elif variant == "xla":
            use_pallas = False
        elif variant == "noattn":
            def fake_paged(q, k_pages, v_pages, page_indices, lengths,
                           **kw):
                return q
            paged_mod.pallas_paged_attention = fake_paged
        elif variant == "noappend":
            def fake_append(cache, k_new, v_new, page_indices, lengths,
                            **kw):
                return cache
            engine_mod.append_to_pages = fake_append
        elif variant == "dus":
            engine_mod.append_to_pages = dus_append
        elif variant == "uniq":
            engine_mod.append_to_pages = uniq_append
        elif variant == "pallas":
            # In-place Pallas append kernel (ops/pallas_append.py), the
            # real gated path: input_output_aliases pins the cache buffers
            # so XLA cannot interpose a defensive copy. DEFAULT since r4 —
            # "full" now equals this; kept for log continuity.
            os.environ["FAT_APPEND_PALLAS"] = "1"
        elif variant == "scatter":
            # Pre-r4 default: XLA scatter append (the defensive-copy path).
            os.environ["FAT_APPEND_PALLAS"] = "0"
        return use_pallas

    results = {}
    for variant in ns.variants.split(","):
        use_pallas = setup(variant)
        decode_raw = engine_mod.make_decode_fn(
            cfg, use_pallas=use_pallas
        ).__wrapped__

        @jax.jit
        def loop(n_, params_, pi_, tokens, caches, lengths):
            def body(i, carry):
                toks, cch, lens = carry
                nxt, cch = decode_raw(params_, cch, toks, pi_, lens)
                return nxt[:, None], cch, lens + 1
            return lax.fori_loop(0, n_, body, (tokens, caches, lengths))

        if ns.memdump:
            # Buffer-assignment attribution instead of timing: a temp
            # allocation in the cache-size class (B*pps*page*D*2B per
            # side per layer) is a defensive copy — the thing the
            # in-place Pallas append exists to kill (VERDICT r3 item 2:
            # "check the 8-layer cache-list donation actually aliases").
            # Two rows per variant: donate=False is a lower bound on
            # copies XLA keeps when the caller retains the caches;
            # donate=True mirrors the REAL engine decode jit
            # (engine.py make_decode_fn: donate_argnums=(1,)) — here the
            # caches land at loop arg index 4.
            caches = fresh_caches()
            cache_mb = sum(
                c.k_pages.nbytes + c.v_pages.nbytes for c in caches
            ) / 1e6
            for donate in (False, True):
                jitted = (jax.jit(loop.__wrapped__, donate_argnums=(4,))
                          if donate else jax.jit(loop.__wrapped__))
                mem = jitted.lower(
                    jnp.int32(8), params, pi, tokens0, caches, lengths0
                ).compile().memory_analysis()
                print(json.dumps({
                    "variant": variant,
                    "donate": donate,
                    "temp_mb": round(mem.temp_size_in_bytes / 1e6, 1),
                    "argument_mb": round(mem.argument_size_in_bytes / 1e6, 1),
                    "output_mb": round(mem.output_size_in_bytes / 1e6, 1),
                    "alias_mb": round(mem.alias_size_in_bytes / 1e6, 1),
                    "cache_total_mb": round(cache_mb, 1),
                    "one_layer_side_mb": round(
                        caches[0].k_pages.nbytes / 1e6, 1),
                }), flush=True)
            continue

        caches = fresh_caches()
        out = loop(jnp.int32(2), params, pi, tokens0, caches, lengths0)
        _ = np.asarray(out[0]).ravel()[:8]
        best = {ns.i1: float("inf"), ns.i2: float("inf")}
        for _ in range(ns.trials):
            for iters in (ns.i1, ns.i2):
                caches = fresh_caches()
                t0 = time.perf_counter()
                out = loop(jnp.int32(iters), params, pi, tokens0, caches,
                           lengths0)
                _ = np.asarray(out[0]).ravel()[:8]
                best[iters] = min(best[iters], time.perf_counter() - t0)
        t_iter = (best[ns.i2] - best[ns.i1]) / (ns.i2 - ns.i1)
        results[variant] = round(t_iter * 1e3, 3)
        print(f"{variant}: {t_iter * 1e3:.3f} ms/step "
              f"(loops {best[ns.i1] * 1e3:.0f} / {best[ns.i2] * 1e3:.0f} ms)",
              flush=True)

    print(json.dumps({
        "metric": "serving_step_attribution_ms",
        "value": results.get("full"),
        "unit": "ms/step",
        "detail": {
            "variants": results, "batch": b, "layers": cfg.n_layers,
            "d_model": cfg.d_model, "ctx": ns.ctx, "page": ns.page,
            "backend": jax.default_backend(),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
