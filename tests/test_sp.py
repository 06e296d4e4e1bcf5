"""Sequence parallelism (parallel/sp.py): sharded-S KV writes, distributed
decode attention, and ring attention — all vs single-device references on
the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama_gguf_inference_tpu.parallel.sp import (
    make_sp_mesh, ring_attention, sp_append_and_attend, sp_decode_attention,
    sp_write_kv,
)


def naive_attention(q, k_cache, v_cache, offsets):
    """Single-device reference: the models.llama XLA path contract.
    q (B, T, H, D); caches (B, KVH, S, D); query t attends to s <= off+t."""
    B, T, H, D = q.shape
    KVH, S = k_cache.shape[1], k_cache.shape[2]
    G = H // KVH
    qh = q.astype(np.float32).reshape(B, T, KVH, G, D)
    scores = np.einsum("btkgd,bksd->bkgts", qh,
                       k_cache.astype(np.float32)) / np.sqrt(D)
    pos = np.arange(S)
    allowed = pos[None, None, :] <= (offsets[:, None, None]
                                     + np.arange(T)[None, :, None])
    scores = np.where(allowed[:, None, None], scores, -1e30)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    ctx = np.einsum("bkgts,bksd->bkgtd", p, v_cache.astype(np.float32))
    return ctx.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D)


@pytest.fixture(scope="module")
def mesh():
    return make_sp_mesh(4)


def test_sp_write_scatter_and_straddle(mesh, rng):
    B, H, S, D, T = 2, 2, 32, 8, 5       # S_loc = 8; offsets straddle shards
    cache = jnp.zeros((B, H, S, D), jnp.float32)
    new = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    offsets = jnp.asarray([6, 13])        # 6..10 spans ranks 0-1; 13..17 ranks 1-2
    cache = jax.device_put(cache, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, "sp", None)))
    out = np.asarray(sp_write_kv(cache, new, offsets, mesh))
    ref = np.zeros((B, H, S, D), np.float32)
    nt = np.asarray(new).transpose(0, 2, 1, 3)
    for b, off in enumerate([6, 13]):
        ref[b, :, off:off + T, :] = nt[b]
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_sp_decode_attention_matches_naive(mesh, rng):
    B, T, H, KVH, D, S = 2, 1, 8, 4, 16, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, KVH, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, KVH, S, D)), jnp.float32)
    # offsets chosen so some ranks hold ONLY future (fully masked) slots
    offsets = jnp.asarray([3, 40])
    out = np.asarray(sp_decode_attention(q, k, v, offsets, mesh))
    ref = naive_attention(np.asarray(q), np.asarray(k), np.asarray(v),
                          np.asarray(offsets))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sp_decode_multi_token_chunk(mesh, rng):
    # T > 1 (a prefill chunk): causality inside the chunk must hold
    B, T, H, KVH, D, S = 1, 4, 4, 2, 8, 32
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, KVH, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, KVH, S, D)), jnp.float32)
    offsets = jnp.asarray([7])            # chunk 7..10 straddles rank 0/1
    out = np.asarray(sp_decode_attention(q, k, v, offsets, mesh))
    ref = naive_attention(np.asarray(q), np.asarray(k), np.asarray(v),
                          np.asarray(offsets))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sp_append_and_attend_matches_contig_step(mesh, rng):
    """A full decode step (KV append + attention) against the sharded cache
    equals the same step against a single-device contiguous cache."""
    B, T, H, KVH, D, S = 2, 1, 4, 2, 8, 32
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, T, KVH, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, T, KVH, D)), jnp.float32)
    k0 = rng.normal(size=(B, KVH, S, D)).astype(np.float32)
    v0 = rng.normal(size=(B, KVH, S, D)).astype(np.float32)
    offsets = jnp.asarray([5, 17])

    out, k_up, v_up = sp_append_and_attend(
        q, k_new, v_new, jnp.asarray(k0), jnp.asarray(v0), offsets, mesh)

    k_ref, v_ref = k0.copy(), v0.copy()
    for b, off in enumerate([5, 17]):
        k_ref[b, :, off:off + T, :] = np.asarray(k_new)[b].transpose(1, 0, 2)
        v_ref[b, :, off:off + T, :] = np.asarray(v_new)[b].transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(k_up), k_ref, atol=0)
    np.testing.assert_allclose(np.asarray(v_up), v_ref, atol=0)
    ref = naive_attention(np.asarray(q), k_ref, v_ref, np.asarray(offsets))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_ring_attention_matches_causal(mesh, rng):
    B, T, H, KVH, D = 2, 32, 4, 2, 8      # T_loc = 8 per rank
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KVH, D)), jnp.float32)
    lengths = jnp.asarray([T, 19])        # row 1 padded past 19

    out = np.asarray(ring_attention(q, k, v, lengths, mesh))

    # reference: plain causal attention over the cache layout
    kc = np.asarray(k).transpose(0, 2, 1, 3)
    vc = np.asarray(v).transpose(0, 2, 1, 3)
    B_, T_, H_, D_ = q.shape
    G = H_ // KVH
    qh = np.asarray(q, np.float32).reshape(B_, T_, KVH, G, D_)
    scores = np.einsum("btkgd,bksd->bkgts", qh, kc) / np.sqrt(D_)
    pos = np.arange(T_)
    allowed = ((pos[None, None, :] <= pos[None, :, None])
               & (pos[None, None, :] < np.asarray(lengths)[:, None, None]))
    scores = np.where(allowed[:, None, None], scores, -1e30)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    ref = (np.einsum("bkgts,bksd->bkgtd", p, vc)
           .transpose(0, 3, 1, 2, 4).reshape(B_, T_, H_, D_))
    # positions past a row's length produce garbage queries — compare live only
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[1, :19], ref[1, :19], rtol=2e-5, atol=2e-5)


def test_ring_attention_invariant_to_sp(rng):
    """The same inputs through sp=2 and sp=4 meshes agree (distribution-
    independence of the ring schedule)."""
    B, T, H, KVH, D = 1, 16, 2, 1, 8
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KVH, D)), jnp.float32)
    lengths = jnp.asarray([T])
    o2 = np.asarray(ring_attention(q, k, v, lengths, make_sp_mesh(2)))
    o4 = np.asarray(ring_attention(q, k, v, lengths, make_sp_mesh(4)))
    np.testing.assert_allclose(o2, o4, rtol=2e-5, atol=2e-5)
