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
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_flash_offset_zero_single_token(rng):
    """First decode step: only slot 0 visible."""
    B, S, H, KVH, D = 1, 32, 4, 2, 64
    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S, KVH, D)).astype(np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v),
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
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(offsets),
                                     blk_s=32))
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

    kq, ks = QuantKV.quantize(jnp.asarray(k))
    vq, vs = QuantKV.quantize(jnp.asarray(v))
    # reference uses the dequantized cache (isolates kernel error from
    # quantization error)
    kd = np.asarray(QuantKV.dequantize(kq, ks, jnp.float32))
    vd = np.asarray(QuantKV.dequantize(vq, vs, jnp.float32))
    want = naive_attention(q, kd, vd, offsets)
    got = np.asarray(flash_attention_q8(
        jnp.asarray(q), kq, ks, vq, vs, jnp.asarray(offsets), blk_s=32))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)
