"""In-place Pallas decode append for the paged KV cache.

Why this kernel exists (queue8/queue9 serving attribution): inside one
jitted serving step, the XLA scatter that appends the new token to the
paged cache costs ~0 alone and the Pallas paged-attention kernel costs
~1.1 ms alone — but composed they read 4.2 ms/step. XLA's buffer
assignment materializes a defensive copy of the (hundreds of MB) cache
between the scatter and the Pallas custom call, and none of the
scatter-level hints recover it (mode="promise_in_bounds" +
unique_indices measured 4.83 ms, a per-batch dynamic_update_slice chain
5.31 ms — benchmarks/results/queue9/serving_attrib2.log).

This kernel makes the append in-place BY CONSTRUCTION:
``input_output_aliases`` pins the k/v page buffers to the outputs, the
grid visits exactly one sub-page block per sequence, and every untouched
byte of the cache is never DMA'd at all. Per step it moves
B * (H, 16, D) sub-blocks twice (read-modify-write) — ~1 MB at serving
shapes vs the cache-sized copy XLA inserts around the scatter.

Preconditions (hold for the serving engine by construction):
- T == 1 (decode append; prefill keeps the vectorized scatter, whose
  one-shot write amortizes the copy),
- distinct sequences own distinct physical pages (allocator invariant),
  so grid programs never write the same page.

Quantized caches (round 4): serving/paged_kv.py quantizes the token and
passes the 1-byte payload through this same kernel; only the small fp32
scale planes keep the XLA scatter (their (page, 1) size-1-lane layout is
a Mosaic slicing hazard, and at ~1% of payload bytes a defensive copy of
them is immaterial).

The reference repo has no serving layer; this is new scope supporting
the paged decode kernel (ops/pallas_paged.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUB = 16  # sub-page write-block rows (fp32-sublane-aligned)


def _kernel(idx_ref, kp_ref, vp_ref, kn_ref, vn_ref, ko_ref, vo_ref):
    b = pl.program_id(0)
    slot = idx_ref[1, b]          # slot WITHIN the visited sub-block
    ok = idx_ref[2, b]
    sub = kp_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sub, 1), 2)
    hit = (rows == slot) & (ok != 0)
    kn = kn_ref[0][:, None, None, :]   # (H, 1, 1, D)
    vn = vn_ref[0][:, None, None, :]
    ko_ref[...] = jnp.where(hit, kn, kp_ref[...])
    vo_ref[...] = jnp.where(hit, vn, vp_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_append_decode(
    k_pages: jax.Array,      # (H_kv, P, page, D)
    v_pages: jax.Array,
    k_new: jax.Array,        # (B, H_kv, D) one token per sequence
    v_new: jax.Array,
    phys: jax.Array,         # (B,) physical page holding the write slot
    slot: jax.Array,         # (B,) slot within that page
    ok: jax.Array,           # (B,) bool/int — masked rows write nothing
    *,
    interpret: bool = False,
):
    """Write one new K/V token per sequence into its page, in place.

    Masked rows (``ok`` false) still visit their page (the grid is static)
    but write the block back unchanged — safe because the grid is
    sequential and pages are owned by single sequences.

    Write granularity (round 4): when page_size % 16 == 0 the visited
    block is a 16-slot SUB-block of the page — the read-modify-write
    moves B * (H, 16, D) per cache side instead of B * (H, page, D)
    (16x less DMA at page=256 serving shapes); the sub-block index rides
    the scalar-prefetch index map, the in-block row compare uses
    slot % 16.
    """
    h, p, page, d = k_pages.shape
    b = k_new.shape[0]
    sub = _SUB if page % _SUB == 0 else page
    idx = jnp.stack([
        phys.astype(jnp.int32),
        (slot % sub).astype(jnp.int32),
        ok.astype(jnp.int32),
        (slot // sub).astype(jnp.int32),   # sub-block index within the page
    ])

    page_spec = pl.BlockSpec(
        (h, 1, sub, d),
        lambda i, idx_ref: (0, idx_ref[0, i], idx_ref[3, i], 0),
    )
    new_spec = pl.BlockSpec((1, h, d), lambda i, idx_ref: (i, 0, 0))

    kp, vp = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[page_spec, page_spec, new_spec, new_spec],
            out_specs=[page_spec, page_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ],
        # Operand numbering counts flattened leaves including the scalar
        # prefetch arg: idx=0, k_pages=1, v_pages=2, k_new=3, v_new=4.
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(idx, k_pages, v_pages,
      k_new.astype(k_pages.dtype), v_new.astype(v_pages.dtype))
    return kp, vp
