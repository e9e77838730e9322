"""Serving tests: allocator (native C++ and Python), paged cache numerics,
and end-to-end continuous batching vs. naive full-forward greedy decoding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.models.transformer import (
    TransformerConfig,
    apply_transformer,
    init_transformer,
)
from flashattention_tpu.ops.reference import reference_attention
from flashattention_tpu.serving import (
    EngineConfig,
    GenerationRequest,
    PageAllocator,
    ServingEngine,
)
from flashattention_tpu.serving.paged_kv import (
    append_to_pages,
    gather_pages,
    init_paged_cache,
    paged_attention_decode,
)

CFG = TransformerConfig(
    vocab_size=89, d_model=64, n_layers=2, n_heads=4, d_ff=128,
    max_seq_len=128, block_size=32, dropout_rate=0.0, dtype=jnp.float32,
    attention_backend="xla",
)


@pytest.fixture(scope="module")
def params():
    return init_transformer(jax.random.key(0), CFG)


# -- allocator ---------------------------------------------------------------


@pytest.mark.parametrize("native", [False, None])
def test_allocator_grow_release(native):
    a = PageAllocator(8, native=native)
    assert a.free_pages() == 8
    assert a.grow(1, 3)
    assert a.free_pages() == 5
    assert len(a.pages(1)) == 3
    assert a.grow(1, 2)  # shrink request: no-op
    assert len(a.pages(1)) == 3
    assert a.grow(2, 5)
    assert not a.grow(3, 1)  # out of pages — all-or-nothing
    assert a.release(1) == 3
    assert a.free_pages() == 3
    with pytest.raises(KeyError):
        a.pages(99)


@pytest.mark.parametrize("native", [False, None])
def test_allocator_release_prefix(native):
    a = PageAllocator(8, native=native)
    assert a.grow(1, 5)
    chain = a.pages(1)
    assert a.release_prefix(1, 2) == 2
    assert a.pages(1) == chain[2:]  # order preserved, prefix gone
    assert a.free_pages() == 5
    assert a.release_prefix(1, 99) == 3  # clamps to chain length
    assert a.pages(1) == []
    assert a.release_prefix(42, 1) == 0  # unknown seq
    # freed pages are reusable
    assert a.grow(2, 8)


def test_native_allocator_builds_and_matches_python():
    a = PageAllocator(16, native=None)
    if not a.is_native:
        pytest.skip("native allocator not built (no toolchain)")
    b = PageAllocator(16, native=False)
    for alloc in (a, b):
        assert alloc.grow(7, 4)
        assert alloc.grow(8, 4)
        alloc.release(7)
        assert alloc.grow(9, 6)
    assert a.free_pages() == b.free_pages() == 6
    assert len(a.pages(9)) == len(b.pages(9)) == 6


# -- paged cache numerics -----------------------------------------------------


@pytest.mark.parametrize("quant", [None, "int8", "fp8", "e5m2"])
def test_paged_roundtrip(quant):
    h, pages, psize, d = 2, 8, 4, 16
    cache = init_paged_cache(h, pages, psize, d, quant=quant, dtype=jnp.float32)
    k_new = jax.random.normal(jax.random.key(0), (1, h, 10, d))
    v_new = jax.random.normal(jax.random.key(1), (1, h, 10, d))
    page_indices = jnp.asarray([[3, 1, 6]])  # 3 pages hold 10 tokens
    cache = append_to_pages(
        cache, k_new, v_new, page_indices, jnp.zeros((1,), jnp.int32)
    )
    k, v = gather_pages(cache, page_indices)
    tol = 0.0 if quant is None else (0.02 if quant == "int8" else 0.1)
    np.testing.assert_allclose(
        np.asarray(k[0, :, :10]), np.asarray(k_new[0]), atol=tol, rtol=tol
    )
    np.testing.assert_allclose(
        np.asarray(v[0, :, :10]), np.asarray(v_new[0]), atol=tol, rtol=tol
    )


def test_pallas_append_matches_scatter(monkeypatch):
    """The in-place Pallas decode append (FAT_APPEND_PALLAS,
    ops/pallas_append.py) writes exactly what the scatter path writes —
    including a mid-page slot, a page-boundary slot, a capacity-masked
    row, and a valid_len-masked row."""
    b, h, pages, psize, d = 4, 2, 8, 4, 16
    pi = jnp.asarray([[3, 1], [0, 2], [5, 6], [7, 4]])
    # row0 mid-page, row1 at a page boundary, row2 AT capacity (masked),
    # row3 masked by valid_len.
    lengths = jnp.asarray([1, 4, 8, 2], jnp.int32)
    valid = jnp.asarray([1, 1, 1, 0], jnp.int32)
    k_new = jax.random.normal(jax.random.key(0), (b, h, 1, d))
    v_new = jax.random.normal(jax.random.key(1), (b, h, 1, d))
    def mk():
        # Fresh arrays per path: the Pallas path's input_output_aliases
        # DONATES the page buffers (that's the point — the engine's cache
        # flows linearly through the step), so they can't be reused.
        base = init_paged_cache(h, pages, psize, d, dtype=jnp.float32)
        return dataclasses.replace(
            base,
            k_pages=jax.random.normal(jax.random.key(2), base.k_pages.shape),
            v_pages=jax.random.normal(jax.random.key(3), base.v_pages.shape),
        )

    monkeypatch.setenv("FAT_APPEND_PALLAS", "0")   # scatter path (default is 1)
    want = append_to_pages(mk(), k_new, v_new, pi, lengths, valid_len=valid)
    monkeypatch.setenv("FAT_APPEND_PALLAS", "1")
    got = append_to_pages(mk(), k_new, v_new, pi, lengths, valid_len=valid)

    np.testing.assert_array_equal(
        np.asarray(want.k_pages), np.asarray(got.k_pages)
    )
    np.testing.assert_array_equal(
        np.asarray(want.v_pages), np.asarray(got.v_pages)
    )


@pytest.mark.parametrize("quant", ["int8", "fp8", "e5m2"])
def test_pallas_append_quantized_matches_scatter(quant, monkeypatch):
    """Round 4: quantized caches ride the in-place Pallas append too —
    payload through the kernel, fp32 scale planes through the small XLA
    scatter. Payloads AND scales must match the scatter path bit-exactly
    (same _quantize_tokens math on both paths)."""
    b, h, pages, psize, d = 4, 2, 8, 4, 16
    pi = jnp.asarray([[3, 1], [0, 2], [5, 6], [7, 4]])
    lengths = jnp.asarray([1, 4, 8, 2], jnp.int32)   # row2 at capacity
    valid = jnp.asarray([1, 1, 1, 0], jnp.int32)     # row3 masked
    k_new = jax.random.normal(jax.random.key(0), (b, h, 1, d))
    v_new = jax.random.normal(jax.random.key(1), (b, h, 1, d))

    def mk():
        base = init_paged_cache(h, pages, psize, d, quant=quant)
        return dataclasses.replace(
            base,
            k_scales=jax.random.uniform(
                jax.random.key(2), base.k_scales.shape, jnp.float32, 0.1, 1.0
            ),
            v_scales=jax.random.uniform(
                jax.random.key(3), base.v_scales.shape, jnp.float32, 0.1, 1.0
            ),
        )

    monkeypatch.setenv("FAT_APPEND_PALLAS", "0")
    want = append_to_pages(mk(), k_new, v_new, pi, lengths, valid_len=valid)
    monkeypatch.setenv("FAT_APPEND_PALLAS", "1")
    got = append_to_pages(mk(), k_new, v_new, pi, lengths, valid_len=valid)

    for fld in ("k_pages", "v_pages", "k_scales", "v_scales"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, fld), np.float32),
            np.asarray(getattr(got, fld), np.float32),
            err_msg=fld,
        )


def test_paged_append_valid_len_masks_padding():
    h, pages, psize, d = 1, 4, 4, 8
    cache = init_paged_cache(h, pages, psize, d, dtype=jnp.float32)
    k_new = jnp.ones((1, h, 8, d))
    page_indices = jnp.asarray([[0, 1]])
    cache = append_to_pages(
        cache, k_new, k_new, page_indices, jnp.zeros((1,), jnp.int32),
        valid_len=jnp.asarray([5]),
    )
    k, _ = gather_pages(cache, page_indices)
    assert np.asarray(k[0, 0, :5]).sum() == 5 * d   # 5 real tokens
    assert np.asarray(k[0, 0, 5:]).sum() == 0       # padding masked


def test_paged_decode_matches_reference():
    b, h, d = 2, 4, 32
    lengths = jnp.asarray([10, 7])
    cache = init_paged_cache(h, 16, 4, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, 12, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, 12, d))
    page_indices = jnp.asarray([[0, 1, 2], [4, 5, 6]])
    cache = append_to_pages(
        cache, kf, vf, page_indices, jnp.zeros((b,), jnp.int32),
        valid_len=lengths,
    )
    q = jax.random.normal(jax.random.key(2), (b, h, d))
    o = paged_attention_decode(q, cache, page_indices, lengths)
    for i in range(b):
        n = int(lengths[i])
        o_ref, _ = reference_attention(
            q[i][None, :, None, :], kf[i][None, :, :n], vf[i][None, :, :n]
        )
        np.testing.assert_allclose(
            np.asarray(o[i]), np.asarray(o_ref[0, :, 0]), rtol=1e-5, atol=1e-5
        )


def test_paged_decode_gqa():
    b, h_q, h_kv, d = 1, 8, 2, 16
    cache = init_paged_cache(h_kv, 8, 4, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h_kv, 8, d))
    vf = jax.random.normal(jax.random.key(1), (b, h_kv, 8, d))
    pi = jnp.asarray([[0, 1]])
    cache = append_to_pages(cache, kf, vf, pi, jnp.zeros((b,), jnp.int32))
    q = jax.random.normal(jax.random.key(2), (b, h_q, d))
    o = paged_attention_decode(q, cache, pi, jnp.asarray([8]))
    # oracle: repeat kv heads 4x
    k_rep = jnp.repeat(kf, 4, axis=1)
    v_rep = jnp.repeat(vf, 4, axis=1)
    o_ref, _ = reference_attention(q[:, :, None, :], k_rep, v_rep)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref[:, :, 0]), rtol=1e-5, atol=1e-5
    )


# -- Pallas paged decode kernel ------------------------------------------------


@pytest.mark.parametrize("quant", [None, "int8", "fp8", "e5m2"])
def test_pallas_paged_matches_gather_executor(quant):
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize = 2, 2, 128, 8
    lengths = jnp.asarray([19, 7])
    cache = init_paged_cache(h, 16, psize, d, quant=quant, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, 24, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, 24, d))
    page_indices = jnp.asarray([[0, 1, 2], [4, 5, 6]])
    cache = append_to_pages(
        cache, kf, vf, page_indices, jnp.zeros((b,), jnp.int32),
        valid_len=lengths,
    )
    q = jax.random.normal(jax.random.key(2), (b, h, d))
    o_ref = paged_attention_decode(q, cache, page_indices, lengths)
    # fp32 compute path: must match the gather executor near-exactly.
    o32 = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, page_indices, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(o32), np.asarray(o_ref), rtol=2e-5, atol=2e-5
    )
    # default (bf16 compute, the TPU fast path): bf16 tolerance.
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, page_indices, lengths,
        k_scales=cache.k_scales, v_scales=cache.v_scales,
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), rtol=2e-2, atol=2e-2
    )


def test_pallas_paged_gqa_and_empty_seq():
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h_q, h_kv, d, psize = 2, 8, 2, 128, 8
    lengths = jnp.asarray([11, 0])  # second sequence empty
    cache = init_paged_cache(h_kv, 8, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h_kv, 16, d))
    vf = jax.random.normal(jax.random.key(1), (b, h_kv, 16, d))
    pi = jnp.asarray([[0, 1], [2, 3]])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h_q, d))
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32,
    )
    o_ref = paged_attention_decode(q, cache, pi, jnp.maximum(lengths, 1))
    np.testing.assert_allclose(
        np.asarray(o[0]), np.asarray(o_ref[0]), rtol=2e-5, atol=2e-5
    )
    assert np.asarray(o[1]).sum() == 0.0  # empty sequence -> zeros


# -- engine end-to-end --------------------------------------------------------


PAD_LEN = 32  # fixed shape -> one compile for every call (causal model:
# positions past t cannot affect position t's logits)


@jax.jit
def _padded_logits(params, tokens):
    return apply_transformer(params, tokens, CFG)


def _naive_greedy(params, prompt, n_new, cfg=None):
    """Full-forward greedy decoding (no cache) as the oracle."""
    tokens = list(prompt)
    out = []
    fwd = _padded_logits if cfg is None else (
        lambda p, t: apply_transformer(p, t, cfg)
    )
    for _ in range(n_new):
        padded = tokens + [0] * (PAD_LEN - len(tokens))
        logits = fwd(params, jnp.asarray([padded], jnp.int32))
        nxt = int(jnp.argmax(logits[0, len(tokens) - 1]))
        out.append(nxt)
        tokens.append(nxt)
    return out


def test_engine_matches_naive_greedy(params):
    ecfg = EngineConfig(
        max_batch_size=4, page_size=8, num_pages=64, max_seq_len=128,
        prefill_pad=16,
    )
    eng = ServingEngine(params, CFG, ecfg)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=n)) for n in (5, 11, 3)]
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p, max_new_tokens=6))
    results = eng.run()
    assert set(results) == {0, 1, 2}
    for i, p in enumerate(prompts):
        expected = _naive_greedy(params, p, 6)
        assert results[i] == expected, (i, results[i], expected)


def test_engine_continuous_admission(params):
    """More requests than slots: later requests admit as earlier ones finish."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
        prefill_pad=16,
    )
    eng = ServingEngine(params, CFG, ecfg)
    rng = np.random.default_rng(1)
    n_req = 5
    for i in range(n_req):
        prompt = list(rng.integers(0, CFG.vocab_size, size=4 + i))
        eng.submit(GenerationRequest(request_id=i, prompt=prompt, max_new_tokens=4))
    results = eng.run()
    assert set(results) == set(range(n_req))
    assert all(len(v) == 4 for v in results.values())
    # all pages returned to the pool (dump page still held)
    assert eng.allocator.free_pages() == ecfg.num_pages - 1


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_engine_quantized_runs(params, quant):
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
        prefill_pad=16, quant=quant,
    )
    eng = ServingEngine(params, CFG, ecfg)
    prompt = list(np.random.default_rng(2).integers(0, CFG.vocab_size, size=6))
    eng.submit(GenerationRequest(request_id=0, prompt=prompt, max_new_tokens=5))
    results = eng.run()
    assert len(results[0]) == 5
    # Quantized greedy tokens may legitimately diverge from exact ones, but
    # the first step (prefill, unquantized attention over the prompt itself)
    # must agree.
    assert results[0][0] == _naive_greedy(params, prompt, 1)[0]


DRAFT_CFG = dataclasses.replace(CFG, n_layers=1, d_model=32, d_ff=64,
                                n_heads=2)


@pytest.fixture(scope="module")
def draft_params():
    return init_transformer(jax.random.key(7), DRAFT_CFG)


def test_spec_engine_matches_naive_greedy(params, draft_params):
    """Speculative decoding over the PAGED engine (VERDICT r3 item 9):
    greedy outputs must be exactly the target model's greedy continuation,
    for a draft that frequently disagrees (independent random weights) and
    with continuous admission (more requests than slots)."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=64, max_seq_len=128,
        prefill_pad=16, spec_gamma=3,
    )
    eng = ServingEngine(
        params, CFG, ecfg, draft_params=draft_params, draft_cfg=DRAFT_CFG
    )
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=n))
               for n in (5, 11, 3, 7)]
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p,
                                     max_new_tokens=6))
    results = eng.run()
    assert set(results) == set(range(len(prompts)))
    for i, p in enumerate(prompts):
        expected = _naive_greedy(params, p, 6)
        assert results[i] == expected, (i, results[i], expected)
    assert eng.spec_rounds > 0 and eng.spec_proposed > 0
    # all pages returned (dump page still held)
    assert eng.allocator.free_pages() == ecfg.num_pages - 1


def test_spec_engine_self_draft_accepts_everything(params):
    """With draft == target, every greedy proposal is accepted: gamma+1
    tokens per round (modulo the final clamped round) and 100% acceptance —
    pins that the draft cache stays position-consistent across rounds."""
    ecfg = EngineConfig(
        max_batch_size=1, page_size=8, num_pages=64, max_seq_len=128,
        prefill_pad=16, spec_gamma=3,
    )
    eng = ServingEngine(
        params, CFG, ecfg, draft_params=params, draft_cfg=CFG
    )
    prompt = list(np.random.default_rng(4).integers(0, CFG.vocab_size, size=6))
    eng.submit(GenerationRequest(request_id=0, prompt=prompt,
                                 max_new_tokens=9))
    results = eng.run()
    assert results[0] == _naive_greedy(params, prompt, 9)
    assert eng.spec_accepted == eng.spec_proposed  # nothing rejected
    # 1 prefill token + ceil(8 / (gamma+1)) = 2 verify rounds
    assert eng.spec_rounds == 2


def test_spec_engine_quantized_runs(params, draft_params):
    """Spec decode composes with quantized pages (the point of doing it on
    the paged engine): int8 payload caches for BOTH models, outputs flow."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=64, max_seq_len=64,
        prefill_pad=16, quant="int8", spec_gamma=2,
    )
    eng = ServingEngine(
        params, CFG, ecfg, draft_params=draft_params, draft_cfg=DRAFT_CFG
    )
    prompt = list(np.random.default_rng(5).integers(0, CFG.vocab_size, size=6))
    eng.submit(GenerationRequest(request_id=0, prompt=prompt,
                                 max_new_tokens=5))
    results = eng.run()
    assert len(results[0]) == 5
    # First token comes from (unquantized-q) prefill: must agree with exact.
    assert results[0][0] == _naive_greedy(params, prompt, 1)[0]


def test_spec_engine_eos_truncates(params):
    """A mid-chunk EOS in the accepted run truncates emission exactly where
    the non-speculative engine stops (first eos occurrence, even when the
    speculated chunk runs past it)."""
    prompt = list(np.random.default_rng(6).integers(0, CFG.vocab_size, size=5))
    base = _naive_greedy(params, prompt, 8)
    eos = base[3]  # an eos hit mid-generation (may also occur earlier)
    kw = dict(max_batch_size=1, page_size=8, num_pages=64, max_seq_len=128,
              prefill_pad=16, eos_token=eos)
    plain = ServingEngine(params, CFG, EngineConfig(**kw))
    plain.submit(GenerationRequest(request_id=0, prompt=prompt,
                                   max_new_tokens=8))
    want = plain.run()[0]
    assert want[-1] == eos and len(want) < 8  # the eos really cut it short
    eng = ServingEngine(
        params, CFG, EngineConfig(spec_gamma=3, **kw),
        draft_params=params, draft_cfg=CFG,
    )
    eng.submit(GenerationRequest(request_id=0, prompt=prompt,
                                 max_new_tokens=8))
    results = eng.run()
    assert results[0] == want


def test_spec_engine_sliding_window_matches_plain(params):
    """Spec decode composes with sliding-window serving: the verify chunk's
    banded paged attention + mid-chain page reclamation must emit exactly
    the plain windowed engine's greedy tokens."""
    cfg = TransformerConfig(
        vocab_size=89, d_model=64, n_layers=2, n_heads=4,
        d_ff=128, max_seq_len=128, block_size=32, dropout_rate=0.0,
        dtype=jnp.float32, attention_backend="xla", attention_window=5,
    )
    wparams = init_transformer(jax.random.key(8), cfg)
    kw = dict(max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
              prefill_pad=16)
    rng = np.random.default_rng(9)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (9, 3)]

    plain = ServingEngine(wparams, cfg, EngineConfig(**kw))
    for i, p in enumerate(prompts):
        plain.submit(GenerationRequest(request_id=i, prompt=p,
                                       max_new_tokens=8))
    want = plain.run()

    eng = ServingEngine(
        wparams, cfg, EngineConfig(spec_gamma=3, **kw),
        draft_params=wparams, draft_cfg=cfg,   # self-draft: max acceptance
    )
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p,
                                     max_new_tokens=8))
    results = eng.run()
    assert results == want


def test_spec_engine_prefix_cache_matches_uncached(params, draft_params):
    """Prefix caching composes with spec decode: adopted prefix pages carry
    valid DRAFT KV too (both models write their pools during the original
    prefill and cached pages are pinned, never recycled), so the draft can
    skip the shared prefix like the target. Outputs must equal the uncached
    spec engine AND the plain engine."""
    rng = np.random.default_rng(12)
    common = list(rng.integers(0, CFG.vocab_size, size=24))
    prompts = [
        common + list(rng.integers(0, CFG.vocab_size, size=7)),
        common + list(rng.integers(0, CFG.vocab_size, size=3)),
    ]

    def run(prefix_cache, spec):
        ecfg = EngineConfig(
            max_batch_size=2, page_size=8, num_pages=64, max_seq_len=128,
            prefill_pad=16, prefix_cache=prefix_cache,
            spec_gamma=3 if spec else 0,
        )
        kw = (dict(draft_params=draft_params, draft_cfg=DRAFT_CFG)
              if spec else {})
        eng = ServingEngine(params, CFG, ecfg, **kw)
        for i, p in enumerate(prompts):
            eng.submit(
                GenerationRequest(request_id=i, prompt=p, max_new_tokens=6)
            )
        return eng, eng.run()

    eng_c, res_c = run(True, spec=True)
    _, res_u = run(False, spec=True)
    _, res_plain = run(False, spec=False)
    assert res_c == res_u == res_plain
    assert len(eng_c._prefix_lru) >= 3  # the shared prefix really cached


def test_engine_evicts_and_requeues_under_pool_pressure(params):
    """Slot eviction + token banking (engine failure handling, SURVEY
    §5.3): a pool too small for both sequences' full length forces an
    in-flight eviction; the evicted request is requeued, its already-
    emitted tokens are banked, and the FINAL output must still be the
    exact greedy continuation for every request."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=7, max_seq_len=32,
        prefill_pad=8,
    )
    eng = ServingEngine(params, CFG, ecfg)
    evictions = []
    real_evict = eng._evict
    eng._evict = lambda slot: (evictions.append(slot.request.request_id),
                               real_evict(slot))[-1]
    rng = np.random.default_rng(17)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=8))
               for _ in range(2)]
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p,
                                     max_new_tokens=20))
    results = eng.run()
    assert set(results) == {0, 1}
    # Pool math: pages_per_seq = ceil(32/8) = 4; dump takes 1 of 7, so
    # both sequences cannot hold 4 pages at once — an eviction must
    # happen for the run to complete.
    assert evictions, "pool math should have forced an eviction"
    for i, p in enumerate(prompts):
        expected = _naive_greedy(params, p, 20)
        assert results[i] == expected, (i, results[i], expected)


def test_spec_engine_evicts_and_requeues_under_pool_pressure(params):
    """Same pressure scenario through the SPECULATIVE tick (the
    _spec_decode_once pressure ladder: shrink prefix pins, then evict) —
    self-draft keeps it greedy-exact end-to-end."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=7, max_seq_len=32,
        prefill_pad=8, spec_gamma=2,
    )
    eng = ServingEngine(params, CFG, ecfg, draft_params=params,
                        draft_cfg=CFG)
    rng = np.random.default_rng(18)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=8))
               for _ in range(2)]
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p,
                                     max_new_tokens=20))
    results = eng.run()
    assert set(results) == {0, 1}
    for i, p in enumerate(prompts):
        expected = _naive_greedy(params, p, 20)
        assert results[i] == expected, (i, results[i], expected)


def test_spec_engine_stochastic_runs_and_composes(params, draft_params):
    """Distribution-preserving (sampled) speculative decoding on the paged
    engine: the draft proposes by sampling, the verify pass runs the
    on-device rejection test (sampling.spec_accept_emit). Checks: exact
    token counts, deterministic under a fixed seed, and near-total
    acceptance for a self-draft (q == p up to fp rounding)."""
    from flashattention_tpu.serving.sampling import SamplingConfig

    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=64, max_seq_len=128,
        prefill_pad=16, spec_gamma=3,
        sampling=SamplingConfig(temperature=0.8, top_k=20), seed=7,
    )
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(0, CFG.vocab_size, size=n)) for n in (5, 9)]

    def run(draft_p, draft_c):
        eng = ServingEngine(
            params, CFG, ecfg, draft_params=draft_p, draft_cfg=draft_c
        )
        for i, p in enumerate(prompts):
            eng.submit(GenerationRequest(request_id=i, prompt=p,
                                         max_new_tokens=7))
        return eng, eng.run()

    eng, results = run(draft_params, DRAFT_CFG)
    assert set(results) == {0, 1}
    assert all(len(v) == 7 for v in results.values())
    assert eng.spec_rounds > 0 and eng.spec_proposed > 0
    # Same seed -> same stream (engine keys fold a monotone counter).
    _, results2 = run(draft_params, DRAFT_CFG)
    assert results == results2

    # Self-draft: q == p bit-for-fp-rounding, so acceptance ~= 1.
    eng3, results3 = run(params, CFG)
    assert all(len(v) == 7 for v in results3.values())
    assert eng3.spec_accepted / eng3.spec_proposed > 0.8


def test_spec_engine_validation(params, draft_params):
    with pytest.raises(ValueError, match="spec_gamma"):
        ServingEngine(
            params, CFG, EngineConfig(spec_gamma=0),
            draft_params=draft_params, draft_cfg=DRAFT_CFG,
        )
    with pytest.raises(ValueError, match="draft_cfg"):
        ServingEngine(
            params, CFG, EngineConfig(spec_gamma=2), draft_params=draft_params
        )
    with pytest.raises(ValueError, match="requires draft_params"):
        ServingEngine(params, CFG, EngineConfig(spec_gamma=2))


def test_engine_gqa_matches_naive_greedy():
    cfg = TransformerConfig(
        vocab_size=89, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=128, max_seq_len=128, block_size=32, dropout_rate=0.0,
        dtype=jnp.float32, attention_backend="xla",
    )
    params = init_transformer(jax.random.key(3), cfg)
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
        prefill_pad=16,
    )
    eng = ServingEngine(params, cfg, ecfg)
    prompt = list(np.random.default_rng(4).integers(0, cfg.vocab_size, size=7))
    eng.submit(GenerationRequest(request_id=0, prompt=prompt, max_new_tokens=5))
    results = eng.run()

    tokens = list(prompt)
    expected = []
    for _ in range(5):
        logits = apply_transformer(params, jnp.asarray([tokens], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        expected.append(nxt)
        tokens.append(nxt)
    assert results[0] == expected


def test_pallas_paged_sliding_window_decode():
    """window on the paged kernel (decode): must match the gather executor's
    banded mask AND the dense windowed oracle; the shifted page walk starts
    mid-table so pages below the band are never computed."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, window = 2, 2, 128, 8, 10
    lengths = jnp.asarray([22, 7])  # one > window, one < window
    cache = init_paged_cache(h, 16, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, 24, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, 24, d))
    pi = jnp.asarray([[0, 1, 2], [4, 5, 6]])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h, d))
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, window=window,
    )
    o_ref = paged_attention_decode(q, cache, pi, lengths, window=window)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), rtol=2e-5, atol=2e-5
    )
    # Dense oracle cross-check for the long row: last `window` keys only.
    L = int(lengths[0])
    o_dense, _ = reference_attention(
        q[:1, :, None, :], kf[:1, :, L - window: L], vf[:1, :, L - window: L],
        causal=True,
    )
    np.testing.assert_allclose(
        np.asarray(o[0]), np.asarray(o_dense[0, :, 0]), rtol=2e-5, atol=2e-5
    )
    # window >= length degenerates to full decode.
    o_full = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, window=64,
    )
    o_full_ref = paged_attention_decode(q, cache, pi, lengths)
    np.testing.assert_allclose(
        np.asarray(o_full), np.asarray(o_full_ref), rtol=2e-5, atol=2e-5
    )


def test_pallas_paged_sliding_window_chunked_prefill():
    """window + q_len > 1: early chunk rows' bands start below late rows'
    (the all-masked-page nan hazard) — oracle is the banded dense attention
    with the chunk as the query suffix."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, total, chunk, window = 1, 2, 128, 8, 24, 8, 9
    cache = init_paged_cache(h, 16, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d))
    pi = jnp.asarray([[0, 1, 2]])
    lengths = jnp.full((b,), total, jnp.int32)
    cache = append_to_pages(cache, kf, vf, pi, jnp.zeros((b,), jnp.int32))
    q = jax.random.normal(jax.random.key(2), (b, h, chunk, d))
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, window=window,
    )
    o_ref, _ = reference_attention(q, kf, vf, causal=True, window=window)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), rtol=2e-5, atol=2e-5
    )
    assert np.isfinite(np.asarray(o)).all()


def test_engine_sliding_window_matches_naive_greedy():
    """Windowed model end-to-end through the engine (banded whole-prompt
    prefill, banded chunked prefill, shifted-page-walk decode) vs the
    windowed full-forward oracle."""
    cfg = TransformerConfig(
        vocab_size=89, d_model=64, n_layers=2, n_heads=4,
        d_ff=128, max_seq_len=128, block_size=32, dropout_rate=0.0,
        dtype=jnp.float32, attention_backend="xla", attention_window=5,
    )
    params = init_transformer(jax.random.key(8), cfg)
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
        prefill_pad=16,
    )
    eng = ServingEngine(params, cfg, ecfg)
    rng = np.random.default_rng(9)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (9, 3)]
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p, max_new_tokens=6))
    results = eng.run()
    for i, p in enumerate(prompts):
        expected = _naive_greedy(params, p, 6, cfg=cfg)
        assert results[i] == expected, (i, results[i], expected)


def test_engine_window_reclaims_pages():
    """Windowed generation must hold only O(window) pages per sequence:
    pages wholly below the band are released back to the pool mid-flight,
    and the shifted page walk still produces the exact greedy outputs."""
    cfg = TransformerConfig(
        vocab_size=89, d_model=64, n_layers=2, n_heads=4,
        d_ff=128, max_seq_len=128, block_size=32, dropout_rate=0.0,
        dtype=jnp.float32, attention_backend="xla", attention_window=6,
    )
    params = init_transformer(jax.random.key(8), cfg)
    ecfg = EngineConfig(
        max_batch_size=1, page_size=4, num_pages=40, max_seq_len=80,
        prefill_pad=8,
    )
    eng = ServingEngine(params, cfg, ecfg)
    prompt = list(np.random.default_rng(10).integers(0, cfg.vocab_size,
                                                     size=6))
    n_new = 40  # final length 46 -> 12 pages of 4 without reclamation
    eng.submit(GenerationRequest(request_id=0, prompt=prompt,
                                 max_new_tokens=n_new))
    min_free = eng.allocator.free_pages()
    out = []
    while eng.waiting or eng._num_active():
        eng.step()
        min_free = min(min_free, eng.allocator.free_pages())
    out = eng.finished[0]
    # Band (6) + write position straddle needs <= 3 live pages of 4; without
    # reclamation the low-water mark would be 39 - 12 = 27.
    assert min_free >= 39 - 4, min_free
    assert eng.allocator.free_pages() == 39  # all returned at finish
    expected = _naive_greedy(params, prompt, n_new, cfg=cfg)
    assert out == expected


def test_engine_rope_matches_naive_greedy():
    """RoPE model through the engine (paged cache, chunked prefill, batched
    decode): K must be rotated with its absolute position before entering
    the pages, and decode q with per-row positions — exact greedy parity
    with the full forward pins all three call sites."""
    cfg = TransformerConfig(
        vocab_size=89, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=128, max_seq_len=128, block_size=32, dropout_rate=0.0,
        dtype=jnp.float32, attention_backend="xla", pos_encoding="rope",
    )
    params = init_transformer(jax.random.key(5), cfg)
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
        prefill_pad=16,
    )
    eng = ServingEngine(params, cfg, ecfg)
    rng = np.random.default_rng(6)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (7, 4)]
    for i, p in enumerate(prompts):
        eng.submit(GenerationRequest(request_id=i, prompt=p, max_new_tokens=5))
    results = eng.run()
    for i, p in enumerate(prompts):
        expected = _naive_greedy(params, p, 5, cfg=cfg)
        assert results[i] == expected, (i, results[i], expected)


def test_multihost_scheduler_matches_naive_greedy(params):
    """Requests split across two engine replicas; merged results must match
    the single-model oracle, and the load balancer must use both."""
    from flashattention_tpu.serving import MultiHostScheduler

    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=32, max_seq_len=64,
        prefill_pad=16,
    )
    sched = MultiHostScheduler(
        [ServingEngine(params, CFG, ecfg), ServingEngine(params, CFG, ecfg)]
    )
    rng = np.random.default_rng(7)
    prompts = {i: list(rng.integers(0, CFG.vocab_size, size=4 + i))
               for i in range(4)}
    routed = set()
    for i, p in prompts.items():
        routed.add(sched.submit(
            GenerationRequest(request_id=i, prompt=p, max_new_tokens=3)
        ))
    assert routed == {0, 1}  # both replicas used
    results = sched.run()
    assert set(results) == set(prompts)
    for i, p in prompts.items():
        assert results[i] == _naive_greedy(params, p, 3)


def test_pallas_paged_chunked_prefill():
    """q_len > 1 against the paged cache: each chunk token attends causally
    to its absolute position. Oracle = dense causal attention over the
    sequence's K/V with the chunk as the query suffix."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, total, chunk = 2, 2, 128, 8, 24, 8
    cache = init_paged_cache(h, 16, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d))
    pi = jnp.asarray([[0, 1, 2], [4, 5, 6]])
    lengths = jnp.full((b,), total, jnp.int32)
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32)
    )
    # the "chunk" is the last `chunk` tokens; cache holds all `total`
    q = jax.random.normal(jax.random.key(2), (b, h, chunk, d))
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32,
    )
    assert o.shape == q.shape
    o_ref, _ = reference_attention(q, kf, vf, causal=True)  # q_len != k_len
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), rtol=2e-5, atol=2e-5
    )


def test_pallas_paged_chunked_prefill_gqa_short_seq():
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h_q, h_kv, d, psize = 1, 4, 2, 128, 8
    total, chunk = 11, 5
    cache = init_paged_cache(h_kv, 8, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h_kv, total, d))
    vf = jax.random.normal(jax.random.key(1), (b, h_kv, total, d))
    pi = jnp.asarray([[0, 1]])
    lengths = jnp.full((b,), total, jnp.int32)
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32),
        valid_len=lengths,
    )
    q = jax.random.normal(jax.random.key(2), (b, h_q, chunk, d))
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32,
    )
    o_ref, _ = reference_attention(
        q, jnp.repeat(kf, 2, axis=1), jnp.repeat(vf, 2, axis=1), causal=True
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("quant", [None, "fp8"])
def test_pallas_paged_merged_matches_flat(quant):
    """Step-merged decode schedule (one online update per head per STEP,
    contiguous K/V scratch) vs the flat per-page kernel: same math, fewer
    dispatches. Covers GQA, ragged lengths incl. a sequence short enough
    that whole merged steps are fully masked, and an empty sequence."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h_q, h_kv, d, psize = 3, 8, 2, 128, 16
    lengths = jnp.asarray([60, 9, 0])
    cache = init_paged_cache(h_kv, 16, psize, d, quant=quant,
                             dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h_kv, 64, d))
    vf = jax.random.normal(jax.random.key(1), (b, h_kv, 64, d))
    pi = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h_q, d))
    kw = dict(k_scales=cache.k_scales, v_scales=cache.v_scales,
              compute_dtype=jnp.float32, pages_per_step=2)
    o_flat = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths, merged=False, **kw
    )
    o_merged = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths, merged=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(o_merged), np.asarray(o_flat), rtol=2e-5, atol=2e-5
    )
    assert np.asarray(o_merged[2]).sum() == 0.0


def test_pallas_paged_merged_window_and_prefill():
    """Merged schedule under sliding window (band-start page walk) and
    chunked prefill (q_len > 1) vs the flat kernel."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, total, window = 2, 4, 64, 16, 96, 24
    cache = init_paged_cache(h, 16, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d))
    pi = jnp.arange(2 * (total // psize)).reshape(b, -1).astype(jnp.int32)
    lengths = jnp.asarray([total, 71])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    # windowed decode
    q = jax.random.normal(jax.random.key(2), (b, h, d))
    for kwargs in (dict(window=window), dict()):
        o_f = pallas_paged_attention(
            q, cache.k_pages, cache.v_pages, pi, lengths,
            compute_dtype=jnp.float32, merged=False, **kwargs
        )
        o_m = pallas_paged_attention(
            q, cache.k_pages, cache.v_pages, pi, lengths,
            compute_dtype=jnp.float32, merged=True, **kwargs
        )
        np.testing.assert_allclose(
            np.asarray(o_m), np.asarray(o_f), rtol=2e-5, atol=2e-5
        )
    # chunked prefill: last 8 tokens of each sequence as the chunk
    t = 8
    qc = jax.random.normal(jax.random.key(3), (b, h, t, d))
    o_f = pallas_paged_attention(
        qc, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, merged=False,
    )
    o_m = pallas_paged_attention(
        qc, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, merged=True,
    )
    np.testing.assert_allclose(
        np.asarray(o_m), np.asarray(o_f), rtol=2e-5, atol=2e-5
    )


# -- prefix caching ------------------------------------------------------------


@pytest.mark.parametrize("native", [False, None])
def test_allocator_refcounts_adopt_pin(native):
    a = PageAllocator(8, native=native)
    assert a.grow(1, 3)
    p = a.pages(1)
    assert all(a.refcount(x) == 1 for x in p)
    # another sequence adopts the first two pages
    assert a.adopt(2, p[:2])
    assert a.pages(2) == p[:2]
    assert a.refcount(p[0]) == 2
    # a cache pin on top
    assert a.pin(p[0]) == 3
    # releasing the owner frees only unshared pages
    free0 = a.free_pages()
    assert a.release(1) == 3
    assert a.free_pages() == free0 + 1       # only p[2] actually freed
    assert a.refcount(p[0]) == 2 and a.refcount(p[1]) == 1
    assert a.release(2) == 2
    assert a.refcount(p[0]) == 1             # pin still holds it
    assert a.unpin(p[0]) == 0                # freed now
    assert a.free_pages() == 8               # everything back in the pool
    # adopt of a free page is refused (would alias future allocations)
    assert not a.adopt(3, [p[0]])
    assert a.pin(p[0]) == -1


def test_engine_prefix_cache_matches_uncached(params):
    """vLLM-style automatic prefix caching: requests sharing a prompt
    prefix reuse its KV pages (refcounted) and skip the shared prefill
    compute — outputs must be IDENTICAL to the uncached engine."""
    rng = np.random.default_rng(3)
    common = list(rng.integers(0, CFG.vocab_size, size=24))  # 3 full pages
    prompts = [
        common + list(rng.integers(0, CFG.vocab_size, size=7)),
        common + list(rng.integers(0, CFG.vocab_size, size=3)),
        common[:10],                       # shorter than the cached run
    ]

    def run(prefix_cache):
        ecfg = EngineConfig(
            max_batch_size=4, page_size=8, num_pages=64, max_seq_len=128,
            prefill_pad=16, prefix_cache=prefix_cache,
        )
        eng = ServingEngine(params, CFG, ecfg)
        for i, p in enumerate(prompts):
            eng.submit(
                GenerationRequest(request_id=i, prompt=p, max_new_tokens=6)
            )
        return eng, eng.run()

    eng_c, res_c = run(True)
    _, res_u = run(False)
    assert res_c == res_u
    # the cache retained the common prefix's pages (3 full pages for the
    # 24-token prefix at page 8, plus entries for the longer prompts)
    assert len(eng_c._prefix_lru) >= 3
    # physical sharing happened: cached pages held multiple refs during the
    # run; after finish, cache pins keep them allocated
    free = eng_c.allocator.free_pages()
    held = len(eng_c._prefix_lru)
    assert free == eng_c.ecfg.num_pages - 1 - held  # dump page + pins


def test_engine_prefix_cache_shares_pages(params):
    """The second request's chain must physically reuse the first's prefix
    pages, and its prefill must skip the shared pages' compute."""
    rng = np.random.default_rng(4)
    common = list(rng.integers(0, CFG.vocab_size, size=16))  # 2 pages @ 8
    ecfg = EngineConfig(
        max_batch_size=1, page_size=8, num_pages=64, max_seq_len=128,
        prefill_pad=16, prefix_cache=True,
    )
    eng = ServingEngine(params, CFG, ecfg)
    eng.submit(GenerationRequest(0, common + [1, 2], max_new_tokens=2))
    eng.run()
    first_pages = [eng._prefix_lru[k] for k in eng._prefix_lru]

    calls = []
    orig = eng._chunk_prefill

    def spy(*a):
        calls.append(int(a[4]))  # base
        return orig(*a)

    eng._chunk_prefill = spy
    eng.submit(GenerationRequest(1, common + [3, 4, 5], max_new_tokens=2))
    res = eng.run()
    assert 1 in res and len(res[1]) == 2
    # prefill started AT the first non-cached page (base 16), not at 0
    assert calls and min(calls) == 16
    # and the adopted pages were the cached ones
    assert first_pages[:2] == [eng._prefix_lru[k]
                               for k in list(eng._prefix_lru)[:2]]


def test_engine_prefix_cache_evicts_under_pressure(params):
    """When the pool runs dry, LRU cache pins are dropped so new requests
    still admit; correctness is preserved."""
    rng = np.random.default_rng(5)
    ecfg = EngineConfig(
        max_batch_size=1, page_size=8, num_pages=10, max_seq_len=64,
        prefill_pad=16, prefix_cache=True,
    )
    eng = ServingEngine(params, CFG, ecfg)
    # fill the cache: 4-page prompt -> 4 pinned pages after finish
    p1 = list(rng.integers(0, CFG.vocab_size, size=32))
    eng.submit(GenerationRequest(0, p1, max_new_tokens=2))
    r1 = eng.run()
    assert len(eng._prefix_lru) == 4
    # a second, unrelated 32-token prompt needs 5 pages; pool has
    # 10 - 1(dump) - 4(pinned) = 5 -> fits without eviction; a third needs
    # eviction of the first's pins
    p2 = list(rng.integers(0, CFG.vocab_size, size=32))
    p3 = list(rng.integers(0, CFG.vocab_size, size=32))
    eng.submit(GenerationRequest(1, p2, max_new_tokens=2))
    eng.submit(GenerationRequest(2, p3, max_new_tokens=2))
    res = eng.run()
    assert set(res) >= {1, 2}
    assert all(len(res[i]) == 2 for i in (1, 2))
    # outputs still match the uncached engine
    ecfg_u = dataclasses.replace(ecfg, prefix_cache=False, num_pages=32)
    eng_u = ServingEngine(params, CFG, ecfg_u)
    for i, p in ((0, p1), (1, p2), (2, p3)):
        eng_u.submit(GenerationRequest(i, p, max_new_tokens=2))
    res_u = eng_u.run()
    assert r1[0] == res_u[0] and res[1] == res_u[1] and res[2] == res_u[2]


def test_paged_decode_softcap_matches_dense(params):
    """softcap on the paged decode path (both kernels + gather executor)
    vs the dense capped oracle."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, total = 2, 4, 64, 16, 64
    cap = 6.0
    cache = init_paged_cache(h, 10, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d)) * 2.0
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d))
    pi = jnp.arange(2 * (total // psize)).reshape(b, -1).astype(jnp.int32)
    lengths = jnp.asarray([total, 41])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h, d)) * 2.0
    o_exec = paged_attention_decode(q, cache, pi, lengths, softcap=cap)
    for merged in (False, True):
        o = pallas_paged_attention(
            q, cache.k_pages, cache.v_pages, pi, lengths,
            compute_dtype=jnp.float32, softcap=cap, merged=merged,
        )
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(o_exec), rtol=2e-5, atol=2e-5,
        )
    # dense oracle per row (row 0: full length)
    o_ref, _ = reference_attention(
        q[:1, :, None, :], kf[:1], vf[:1], softcap=cap
    )
    np.testing.assert_allclose(
        np.asarray(o_exec[0]), np.asarray(o_ref[0, :, 0]),
        rtol=2e-5, atol=2e-5,
    )


# -- attention sinks on the paged path ----------------------------------------


@pytest.mark.parametrize("native", [False, None])
def test_allocator_release_range(native):
    a = PageAllocator(8, native=native)
    assert a.grow(1, 6)
    chain = a.pages(1)
    assert a.release_range(1, 2, 3) == 3        # free positions 2..4
    assert a.pages(1) == chain[:2] + chain[5:]
    assert a.free_pages() == 5
    assert a.release_range(1, 9, 1) == 0        # past the chain
    assert a.release_range(1, 1, 99) == 2       # clamps


@pytest.mark.parametrize("merged", [False, True])
def test_pallas_paged_sinks_matches_executor(merged):
    """Sink pages + band walk on both kernel schedules, decode and chunked
    prefill, vs the gather executor; includes a freed-middle page row (the
    engine's StreamingLLM layout: [sinks][dump hole][band])."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, total = 2, 4, 64, 16, 128
    window, sinks = 40, 20  # sinks span 1.25 pages
    cache = init_paged_cache(h, 20, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d))
    pi = jnp.arange(2 * (total // psize)).reshape(b, -1).astype(jnp.int32)
    lengths = jnp.asarray([total, 77])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h, d))
    o_exec = paged_attention_decode(
        q, cache, pi, lengths, window=window, sinks=sinks
    )
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, window=window, sinks=sinks,
        merged=merged,
    )
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_exec), rtol=2e-5, atol=2e-5
    )
    # dense oracle cross-check for the full-length row
    s_full = jnp.einsum("hqd,hkd->hqk", q[:1][0][:, None, :].astype(jnp.float32),
                        kf[0].astype(jnp.float32)) * (d ** -0.5)
    cols = jnp.arange(total)[None, None, :]
    keep = (cols < sinks) | (cols >= total - window)
    s_full = jnp.where(keep, s_full, -1e30)
    p = jax.nn.softmax(s_full, axis=-1)
    o_dense = jnp.einsum("hqk,hkd->hqd", p, vf[0].astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(o[0]), np.asarray(o_dense[:, 0]), rtol=2e-4, atol=2e-4
    )
    # freed-middle layout: pages strictly between sinks and band -> dump,
    # must not change the output (they are never read)
    dump = 19
    sink_pages = -(-sinks // psize)
    first_band = (int(lengths[0]) - 1 - window + 1) // psize
    pif = np.asarray(pi).copy()
    pif[0, sink_pages:first_band] = dump
    o_free = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, jnp.asarray(pif), lengths,
        compute_dtype=jnp.float32, window=window, sinks=sinks,
        merged=merged,
    )
    np.testing.assert_array_equal(np.asarray(o_free[0]), np.asarray(o[0]))


@pytest.mark.parametrize("merged", [False, True])
def test_pallas_paged_sinks_chunked_prefill(merged):
    """sinks + window with q_len > 1 (the engine's chunked-prefill path on a
    StreamingLLM model): each chunk row's band starts at its own absolute
    position while the sink prefix stays visible to every row. Oracle is the
    dense sinks+window reference with the chunk as the query suffix.
    psize=16 keeps the merged schedule eligible (page_size % 16 == 0)."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize, total, chunk = 2, 4, 64, 16, 128, 8
    window, sinks = 24, 20  # sinks span 1.25 pages; band straddles pages
    npg = total // psize
    cache = init_paged_cache(h, b * npg + 2, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, total, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, total, d))
    pi = (jnp.arange(b * npg).reshape(b, -1) + 1).astype(jnp.int32)
    lengths = jnp.asarray([total, 93])  # short row: chunk ends mid-page
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h, chunk, d))
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32, window=window, sinks=sinks, merged=merged,
    )
    assert np.isfinite(np.asarray(o)).all()
    for row in range(b):
        ln = int(lengths[row])
        o_ref, _ = reference_attention(
            q[row:row + 1], kf[row:row + 1, :, :ln], vf[row:row + 1, :, :ln],
            causal=True, window=window, sinks=sinks,
        )
        np.testing.assert_allclose(
            np.asarray(o[row]), np.asarray(o_ref[0]), rtol=2e-5, atol=2e-5
        )


def test_engine_sinks_e2e_matches_uncapped_memory(params):
    """StreamingLLM serving: window+sinks engine (with mid-chain page
    reclamation active) must produce the same tokens as the same model
    served without any reclamation pressure."""
    cfg = dataclasses.replace(
        CFG, attention_window=24, attention_sinks=8
    )
    p2 = init_transformer(jax.random.key(0), cfg)
    prompt = list(np.random.default_rng(7).integers(0, cfg.vocab_size, 20))

    def run(num_pages):
        ecfg = EngineConfig(
            max_batch_size=1, page_size=8, num_pages=num_pages,
            max_seq_len=128, prefill_pad=16,
        )
        eng = ServingEngine(p2, cfg, ecfg)
        eng.submit(GenerationRequest(0, prompt, max_new_tokens=40))
        res = eng.run()
        return res[0], eng

    out_big, _ = run(64)
    # Pool too small for O(length): prompt 20 + 40 new = 60 tokens = 8
    # pages + dump = 9 > 8. Only mid-chain reclamation (window 24 + sink 8
    # => ~6 live pages) lets this run WITHOUT eviction; identical output
    # proves the freed pages were truly dead.
    out_small, eng = run(8)
    assert out_big == out_small and len(out_big) == 40
    assert eng._evicted_prefix == {}  # no eviction happened
    assert eng.slots[0].request is None  # finished


def test_int8_mxu_decode_path(monkeypatch):
    """int8-MXU merged decode (FAT_PAGED_INT8_MXU): raw s8xs8->s32 matmuls
    with q/p row quantization. The added noise is the same class the int8
    cache itself injects (~0.4%/element), so parity vs the convert path and
    vs the gather oracle is pinned at 2e-2 — and the path must be BIT-OFF
    from the convert path (proves it actually engaged)."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h_kv, h_q, page, pps, d = 2, 2, 4, 16, 4, 64
    maxlen = page * pps
    lengths = jnp.asarray([maxlen, 23], jnp.int32)
    pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    cache = init_paged_cache(h_kv, b * pps + 1, page, d, quant="int8")
    ks = jax.random.normal(jax.random.key(0), (b, h_kv, maxlen, d))
    vs = jax.random.normal(jax.random.key(1), (b, h_kv, maxlen, d))
    cache = append_to_pages(cache, ks, vs, pi, jnp.zeros((b,), jnp.int32),
                            valid_len=lengths)
    q = jax.random.normal(jax.random.key(9), (b, h_q, d), jnp.float32)

    def run(flag):
        monkeypatch.setenv("FAT_PAGED_INT8_MXU", flag)
        return np.asarray(pallas_paged_attention(
            q, cache.k_pages, cache.v_pages, pi, lengths,
            k_scales=cache.k_scales, v_scales=cache.v_scales,
            compute_dtype=jnp.float32, merged=True,
        ))

    o_mxu, o_conv, o_qk = run("1"), run("0"), run("qk")
    o_ref = np.asarray(paged_attention_decode(q, cache, pi, lengths))
    assert np.abs(o_mxu - o_conv).max() < 2e-2
    assert np.abs(o_mxu - o_ref).max() < 2e-2
    assert np.abs(o_mxu - o_conv).max() > 0  # the fast path engaged
    # hybrid "qk" mode: s8 QK + converted-V bf16 PV — no p requant, so it
    # sits CLOSER to the convert path than "full" does (only q-quant noise).
    assert np.abs(o_qk - o_conv).max() < 2e-2
    assert np.abs(o_qk - o_ref).max() < 2e-2
    assert np.abs(o_qk - o_conv).max() > 0
    # chunked prefill (q_len > 1) rides the same kernel
    q4 = jax.random.normal(jax.random.key(11), (b, h_q, 8, d), jnp.float32)

    def run4(flag):
        monkeypatch.setenv("FAT_PAGED_INT8_MXU", flag)
        return np.asarray(pallas_paged_attention(
            q4, cache.k_pages, cache.v_pages, pi, lengths,
            k_scales=cache.k_scales, v_scales=cache.v_scales,
            compute_dtype=jnp.float32, merged=True,
        ))

    assert np.abs(run4("1") - run4("0")).max() < 2e-2


@pytest.mark.parametrize("quant", [None, "int8", "fp8"])
def test_append_dus_matches_scatter(monkeypatch, quant):
    """FAT_APPEND_DUS=1 (T=1 per-batch dynamic_update_slice path) writes
    bit-identical caches to the scatter path, including masked writes:
    a full sequence (position past page capacity) and valid_len == 0."""
    from flashattention_tpu.serving.paged_kv import (
        append_to_pages, init_paged_cache,
    )

    b, h, page, pps, d = 4, 2, 16, 4, 32
    pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps) + 1
    # row 2: at capacity (write must drop); row 3: valid_len 0 (drop)
    lengths = jnp.asarray([0, 37, pps * page, 5], jnp.int32)
    valid = jnp.asarray([1, 1, 1, 0], jnp.int32)
    k = jax.random.normal(jax.random.key(0), (b, h, 1, d))
    v = jax.random.normal(jax.random.key(1), (b, h, 1, d))

    def run(flag):
        monkeypatch.setenv("FAT_APPEND_DUS", flag)
        cache = init_paged_cache(h, b * pps + 2, page, d, quant=quant)
        # pre-fill so masked RMW has non-trivial current values to keep
        cache = append_to_pages(
            cache, jax.random.normal(jax.random.key(7), (b, h, 8, d)),
            jax.random.normal(jax.random.key(8), (b, h, 8, d)),
            pi, jnp.zeros((b,), jnp.int32),
        )
        return append_to_pages(cache, k, v, pi, lengths, valid_len=valid)

    got, ref = run("1"), run("0")
    for name in ("k_pages", "v_pages", "k_scales", "v_scales"):
        a, r = getattr(got, name), getattr(ref, name)
        if a is None:
            assert r is None
            continue
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(r, np.float32),
            err_msg=f"{quant} {name}",
        )

# Fast-lane marker (VERDICT r4 item 8): these files hold the long e2e
# tests (serving engine ticks, process-isolated multihost, pipeline/MoE
# train steps). `pytest -m "not slow"` is the <10 min lane.
pytestmark = pytest.mark.slow


def test_paged_ablate_requires_merged_kernel(monkeypatch):
    """FAT_PAGED_ABLATE arms exist only in the merged kernel; at shapes
    where merged disengages (page_size % 16 != 0 here) the call must fail
    loud rather than silently time the unmodified flat path — a silent
    drop records 'stage costs nothing' into the attribution artifact
    (ADVICE r5)."""
    from flashattention_tpu.ops.pallas_paged import pallas_paged_attention

    b, h, d, psize = 1, 2, 128, 8  # page size 8 -> merged always off
    lengths = jnp.asarray([11])
    cache = init_paged_cache(h, 8, psize, d, dtype=jnp.float32)
    kf = jax.random.normal(jax.random.key(0), (b, h, 16, d))
    vf = jax.random.normal(jax.random.key(1), (b, h, 16, d))
    pi = jnp.asarray([[0, 1]])
    cache = append_to_pages(
        cache, kf, vf, pi, jnp.zeros((b,), jnp.int32), valid_len=lengths
    )
    q = jax.random.normal(jax.random.key(2), (b, h, d))
    monkeypatch.setenv("FAT_PAGED_ABLATE", "onehead")
    with pytest.raises(ValueError, match="merged"):
        pallas_paged_attention(
            q, cache.k_pages, cache.v_pages, pi, lengths,
            compute_dtype=jnp.float32,
        )
    # And the prod path is untouched once the env is cleared.
    monkeypatch.delenv("FAT_PAGED_ABLATE")
    o = pallas_paged_attention(
        q, cache.k_pages, cache.v_pages, pi, lengths,
        compute_dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(o)).all()


def test_engine_rejects_request_larger_than_pool(params):
    """A request whose page need exceeds the PHYSICAL pool can never be
    satisfied by eviction or pin-shedding; _admit always works on
    waiting[0], so leaving it queued livelocks every request behind it
    (review r5). It must be rejected like a too-long prompt, and the
    queue must keep moving."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=8, max_seq_len=128,
        prefill_pad=16,
    )
    eng = ServingEngine(params, CFG, ecfg)
    rng = np.random.default_rng(0)
    big = list(rng.integers(0, CFG.vocab_size, size=100))  # 13 pages > 8
    small = list(rng.integers(0, CFG.vocab_size, size=5))
    eng.submit(GenerationRequest(request_id=0, prompt=big, max_new_tokens=4))
    eng.submit(GenerationRequest(request_id=1, prompt=small, max_new_tokens=4))
    res = eng.run()
    assert res[0] == []          # rejected, not livelocked
    assert len(res[1]) == 4      # the queue progressed past it


def test_chunked_prefill_learned_pos_table_overrun(params):
    """Prefix sharing page-aligns the chunk base, so the final PADDED
    chunk can overrun the learned-position table (base + prefill_pad >
    max_seq_len). dynamic_slice CLAMPED the start and embedded the valid
    tail rows with wrong positions — silent generation corruption
    (review r5); the clip-gather keeps every valid row exact. Shape: last
    chunk base=120, pad 32 -> 152 > the 128-row table."""
    ecfg = EngineConfig(
        max_batch_size=2, page_size=8, num_pages=64, max_seq_len=128,
        prefill_pad=32, prefix_cache=True,
    )
    eng = ServingEngine(params, CFG, ecfg)
    rng = np.random.default_rng(3)
    shared = list(rng.integers(0, CFG.vocab_size, size=24))  # 3 full pages
    p0 = shared + list(rng.integers(0, CFG.vocab_size, size=16))
    p1 = shared + list(rng.integers(0, CFG.vocab_size, size=98))  # 122 toks
    eng.submit(GenerationRequest(request_id=0, prompt=p0, max_new_tokens=4))
    res_a = eng.run()
    eng.submit(GenerationRequest(request_id=1, prompt=p1, max_new_tokens=6))
    res_b = eng.run()
    assert res_a[0] == _naive_greedy(params, p0, 4)
    assert res_b[1] == _naive_greedy(params, p1, 6)
