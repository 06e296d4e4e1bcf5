"""Paged KV cache: page-table-routed writes, logical gathers, the paged
flash kernel (interpret mode), and allocator bookkeeping — all checked
against the contiguous cache on identical data."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_gguf_inference_tpu.ops.flash_attention import flash_attention_paged
from llama_gguf_inference_tpu.runtime.paged_kv import PagedKV, PageAllocator
from llama_gguf_inference_tpu.models.config import ModelConfig

from tests.test_flash_attention import naive_attention


def _cfg(n_layers=2, kvh=2, d=64):
    return ModelConfig(arch="llama", dim=kvh * d, n_layers=n_layers,
                       n_heads=kvh, n_kv_heads=kvh, head_dim=d,
                       ffn_dim=64, vocab_size=32)


def _identity_table(B, NP):
    """Slot b owns pages [b*NP ... (b+1)*NP) — mimics the contiguous split."""
    return jnp.asarray(np.arange(B * NP, dtype=np.int32).reshape(B, NP))


def test_paged_write_matches_contiguous(rng):
    cfg = _cfg()
    B, NP, page_s, T = 2, 4, 32, 5
    cache = PagedKV.zeros(cfg, B, pool_pages=B * NP, page_s=page_s)
    cache = cache._replace(page_table=_identity_table(B, NP))

    k = rng.normal(size=(B, T, 2, 64)).astype(np.float32)
    v = rng.normal(size=(B, T, 2, 64)).astype(np.float32)
    offsets = jnp.asarray([30, 0], jnp.int32)   # slot 0 crosses a page edge
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), offsets)

    kg = np.asarray(cache.gather(0)[0], np.float32)  # (B, KVH, NP*page_s, D)
    np.testing.assert_allclose(kg[0, :, 30:35], k[0].transpose(1, 0, 2),
                               atol=0.01, rtol=0.01)
    np.testing.assert_allclose(kg[1, :, 0:5], k[1].transpose(1, 0, 2),
                               atol=0.01, rtol=0.01)
    assert (kg[0, :, :30] == 0).all() and (kg[0, :, 35:] == 0).all()
    # layer 1 untouched
    assert (np.asarray(cache.gather(1)[0]) == 0).all()


def test_paged_write_scattered_pages(rng):
    """Non-contiguous physical pages must land logically contiguous."""
    cfg = _cfg(n_layers=1)
    B, NP, page_s, T = 1, 4, 32, 64
    cache = PagedKV.zeros(cfg, B, pool_pages=8, page_s=page_s)
    # logical pages 0..3 -> physical 7, 2, 5, 0
    cache = cache._replace(
        page_table=jnp.asarray([[7, 2, 5, 0]], jnp.int32))
    k = rng.normal(size=(B, T, 2, 64)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(k),
                        jnp.asarray([10], jnp.int32))
    kg = np.asarray(cache.gather(0)[0], np.float32)
    np.testing.assert_allclose(kg[0, :, 10:74], k[0].transpose(1, 0, 2),
                               atol=0.01, rtol=0.01)


def test_paged_write_unassigned_dropped(rng):
    """Positions whose logical page is unassigned (-1) are dropped, not
    wrapped into someone else's page."""
    cfg = _cfg(n_layers=1)
    cache = PagedKV.zeros(cfg, 1, pool_pages=4, page_s=32)
    cache = cache._replace(
        page_table=jnp.asarray([[1, -1, -1, -1]], jnp.int32))
    k = jnp.ones((1, 40, 2, 64), jnp.float32)     # 8 tokens past page 0
    cache = cache.write(0, k, k, jnp.asarray([0], jnp.int32))
    pool = np.asarray(cache.k[0], np.float32)
    assert (pool[1] != 0).any()                    # assigned page written
    assert (pool[0] == 0).all() and (pool[2:] == 0).all()


@pytest.mark.parametrize("T", [1, 4])
def test_paged_flash_matches_naive(T, rng):
    B, H, KVH, D = 2, 4, 2, 64
    NP, page_s = 4, 32
    S = NP * page_s
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([40, 100], np.int32)
    want = naive_attention(q, k, v, offsets)

    # scatter the logical sequence into shuffled physical pages
    perm = np.array([5, 0, 7, 2, 1, 6, 3, 4], np.int32)  # pool of 8 pages
    pt = perm[:B * NP].reshape(B, NP)
    pool_k = np.zeros((8, KVH, page_s, D), np.float32)
    pool_v = np.zeros((8, KVH, page_s, D), np.float32)
    for b in range(B):
        for j in range(NP):
            blk = slice(j * page_s, (j + 1) * page_s)
            pool_k[pt[b, j]] = k[b, blk].transpose(1, 0, 2)
            pool_v[pt[b, j]] = v[b, blk].transpose(1, 0, 2)

    got = np.asarray(flash_attention_paged(
        jnp.asarray(q), jnp.asarray(pool_k), jnp.asarray(pool_v),
        jnp.asarray(offsets), jnp.asarray(pt)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_paged_forward_matches_contiguous(rng):
    """Full model forward with a paged cache == contiguous cache logits
    (same weights, same tokens) — covers write + XLA fallback attention."""
    import jax
    from llama_gguf_inference_tpu.models.llama import KVCache, forward
    from llama_gguf_inference_tpu.runtime.loader import load_model
    from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

    p = "/tmp/paged_test_model.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    cfg, params, reader = load_model(p, mode="dense")
    reader.close()

    ids = jnp.asarray(rng.integers(3, 200, size=(2, 6)), jnp.int32)
    offsets = jnp.zeros(2, jnp.int32)
    lengths = jnp.full(2, 6, jnp.int32)

    contig = KVCache.zeros(cfg, 2, 128)
    want, _ = forward(params, cfg, ids, offsets, contig, lengths)

    paged = PagedKV.zeros(cfg, 2, pool_pages=4, page_s=64)
    paged = paged._replace(page_table=jnp.asarray([[2, 0], [3, 1]], jnp.int32))
    got, got_cache = forward(params, cfg, ids, offsets, paged, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    # decode continuation: one more token through the updated paged cache
    nxt = jnp.asarray([[7], [9]], jnp.int32)
    off2 = jnp.full(2, 6, jnp.int32)
    cache2 = KVCache.zeros(cfg, 2, 128)
    _, cache2 = forward(params, cfg, ids, offsets, cache2, lengths)
    want2, _ = forward(params, cfg, nxt, off2, cache2,
                       jnp.ones(2, jnp.int32))
    got2, _ = forward(params, cfg, nxt, off2, got_cache,
                      jnp.ones(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=1e-4, rtol=1e-4)


def test_page_allocator():
    a = PageAllocator(pool_pages=8, batch=2)
    assert a.free_pages == 8
    assert a.reserve(0, 3) and a.free_pages == 5
    assert a.reserve(1, 4) and a.free_pages == 1
    assert not a.reserve(0, 2)          # exhausted: nothing allocated
    assert a.free_pages == 1
    assert a.reserve(0, 1)              # extend slot 0 by one page
    assert (a.table[0] >= 0).sum() == 4
    a.release(0)
    assert a.free_pages == 4 and (a.table[0] == -1).all()
    # released pages are reusable
    assert a.reserve(1, 4) and (a.table[1] >= 0).sum() == 8


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from llama_gguf_inference_tpu.utils.testing import write_tiny_llama
    p = tmp_path_factory.mktemp("paged") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    return str(p)


def test_engine_paged_matches_contig(tiny_model):
    """Greedy tokens from a paged engine == contiguous engine."""
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    prompt = list(range(3, 43))
    p = SamplingParams(temperature=0.0, max_tokens=12)

    def run(layout):
        eng = InferenceEngine(tiny_model, EngineConfig(
            max_slots=2, ctx=128, prefill_buckets=(16, 64), mode="dense",
            kv_layout=layout, kv_page_size=64))
        eng.start()
        toks = [ev.token_id for ev in eng.generate(prompt, p)
                if ev.token_id >= 0]
        # paged bookkeeping: pages returned after completion
        if eng.alloc is not None:
            assert eng.alloc.free_pages == eng.alloc.table.shape[1]
        eng.stop()
        return toks

    assert run("paged") == run("contig")


def test_engine_paged_long_request_exceeds_slot_share(tiny_model):
    """The headline paged property: ONE request can use more than
    ctx/max_slots tokens when other slots are idle (contig would truncate
    the prompt to its 1/B share)."""
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    eng = InferenceEngine(tiny_model, EngineConfig(
        max_slots=4, ctx=64, prefill_buckets=(16, 64), mode="dense",
        kv_layout="paged", kv_page_size=32))   # pool = 256 tokens, 8 pages
    eng.start()
    # 150-token prompt >> the 64-token per-slot share
    prompt = [3 + (i % 40) for i in range(150)]
    evs = list(eng.generate(prompt, SamplingParams(temperature=0.0,
                                                   max_tokens=8)))
    assert evs[-1].finished and evs[-1].n_prompt == 150
    assert sum(1 for e in evs if e.token_id >= 0) == 8
    assert eng.alloc.free_pages == 8
    eng.stop()


def test_engine_paged_pool_exhaustion_queues(tiny_model):
    """When the pool can't cover a request it waits (head-of-line) until a
    running request frees pages — no corruption, both complete."""
    import threading
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    eng = InferenceEngine(tiny_model, EngineConfig(
        max_slots=2, ctx=64, prefill_buckets=(16, 64), mode="dense",
        kv_layout="paged", kv_page_size=32))   # pool = 128 tokens, 4 pages
    eng.start()
    long_prompt = [3 + (i % 40) for i in range(90)]  # needs all 4 pages
    results = {}

    def run(name):
        evs = list(eng.generate(long_prompt,
                                SamplingParams(temperature=0.0,
                                               max_tokens=8)))
        results[name] = evs

    t1 = threading.Thread(target=run, args=("a",))
    t2 = threading.Thread(target=run, args=("b",))
    t1.start(); t2.start()
    t1.join(timeout=120); t2.join(timeout=120)
    assert not t1.is_alive() and not t2.is_alive()
    for evs in results.values():
        assert evs[-1].finished
        assert sum(1 for e in evs if e.token_id >= 0) == 8
    assert eng.alloc.free_pages == 4
    eng.stop()


def test_engine_paged_q8_matches_contig_q8(tiny_model):
    """paged x quantized-KV composes (r5, VERDICT r4 weak list): greedy
    tokens from a paged q8_0 engine == the contiguous q8_0 engine (the
    codec is shared, so both quantize identically; only the storage
    routing differs)."""
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    prompt = list(range(3, 43))
    p = SamplingParams(temperature=0.0, max_tokens=12)

    def run(layout):
        eng = InferenceEngine(tiny_model, EngineConfig(
            max_slots=2, ctx=128, prefill_buckets=(16, 64), mode="dense",
            kv_layout=layout, kv_dtype="q8_0", kv_page_size=64))
        eng.start()
        toks = [ev.token_id for ev in eng.generate(prompt, p)
                if ev.token_id >= 0]
        if eng.alloc is not None:
            assert eng.alloc.free_pages == eng.alloc.table.shape[1]
        eng.stop()
        return toks

    assert run("paged") == run("contig")


def test_engine_paged_q4_still_rejected(tiny_model):
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)
    with pytest.raises(ValueError, match="4-bit paged"):
        InferenceEngine(tiny_model, EngineConfig(
            max_slots=2, ctx=128, prefill_buckets=(16,), mode="dense",
            kv_layout="paged", kv_dtype="q4_0"))


def test_paged_q8_flash_matches_naive(rng):
    """Kernel-level: paged q8 flash == naive attention over the
    dequantized logical view, with shuffled physical pages."""
    from llama_gguf_inference_tpu.ops.flash_attention import (
        flash_attention_paged_q8,
    )
    from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV

    B, T, H, KVH, D = 2, 1, 4, 2, 64
    NP, page_s = 4, 32
    S = NP * page_s
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([40, 100], np.int32)
    kq, ks = QuantKV.quantize(jnp.asarray(k))        # (B, S, KVH, ...)
    vq, vs = QuantKV.quantize(jnp.asarray(v))
    kd = np.asarray(QuantKV.dequantize(kq, ks, jnp.float32))
    vd = np.asarray(QuantKV.dequantize(vq, vs, jnp.float32))
    want = naive_attention(q, kd, vd, offsets)

    perm = np.array([5, 0, 7, 2, 1, 6, 3, 4], np.int32)
    pt = perm[:B * NP].reshape(B, NP)
    pool_kq = np.zeros((8, KVH, page_s, D), np.int8)
    pool_vq = np.zeros((8, KVH, page_s, D), np.int8)
    pool_ks = np.zeros((8, KVH, page_s), np.float32)
    pool_vs = np.zeros((8, KVH, page_s), np.float32)
    for b in range(B):
        for j in range(NP):
            blk = slice(j * page_s, (j + 1) * page_s)
            pool_kq[pt[b, j]] = np.asarray(kq)[b, blk].transpose(1, 0, 2)
            pool_vq[pt[b, j]] = np.asarray(vq)[b, blk].transpose(1, 0, 2)
            pool_ks[pt[b, j]] = np.asarray(ks)[b, blk].transpose(1, 0)
            pool_vs[pt[b, j]] = np.asarray(vs)[b, blk].transpose(1, 0)

    got = np.asarray(flash_attention_paged_q8(
        jnp.asarray(q), jnp.asarray(pool_kq), jnp.asarray(pool_ks),
        jnp.asarray(pool_vq), jnp.asarray(pool_vs),
        jnp.asarray(offsets), jnp.asarray(pt)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_shard_cache_paged_q8_replicates_table():
    """r5 regression: shard_cache must replicate PagedQuantKV's page table
    (the generic branch tp-sharded it — crashing whenever pool_pages % tp
    != 0 and contradicting the flash kernel's replicated in_spec)."""
    import jax
    from llama_gguf_inference_tpu.models.config import ModelConfig
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh
    from llama_gguf_inference_tpu.parallel.partition import shard_cache
    from llama_gguf_inference_tpu.runtime.paged_kv import PagedQuantKV

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = ModelConfig(arch="llama", dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, head_dim=16, ffn_dim=96, vocab_size=64)
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    cache = PagedQuantKV.zeros(cfg, batch=2, pool_pages=3, page_s=16)
    sharded = shard_cache(cache, mesh, n_kv_heads=2, batch=2)
    assert sharded.page_table.sharding.is_fully_replicated
    # pools shard over kv heads
    assert not sharded.k_q[0].sharding.is_fully_replicated
