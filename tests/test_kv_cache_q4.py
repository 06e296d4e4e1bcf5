"""q4_0 KV cache (llama.cpp ``--cache-type-k q4_0`` equivalent): packed
codec accuracy, flash-kernel parity with the XLA dequant path, and
end-to-end generation parity with bf16."""

import numpy as np
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.models.config import ModelConfig
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV4
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def test_quantize_roundtrip(rng):
    x = rng.normal(size=(2, 5, 4, 64)).astype(np.float32)
    q, s = QuantKV4.quantize(jnp.asarray(x))
    assert q.shape == (2, 5, 4, 32) and q.dtype == jnp.uint8
    y = np.asarray(QuantKV4.dequantize(q, s, jnp.float32))
    # 4-bit symmetric: |err| <= s/2 = amax/14 per element
    amax = np.abs(x).max(axis=-1, keepdims=True)
    assert (np.abs(y - x) <= amax / 14 + 1e-6).all()
    # zero vectors stay zero with no NaN
    q, s = QuantKV4.quantize(jnp.zeros((1, 1, 1, 64)))
    out = np.asarray(QuantKV4.dequantize(q, s, jnp.float32))
    assert np.isfinite(out).all() and (out == 0).all()


def test_packing_is_planar(rng):
    """Byte j holds element j (low nibble) and j + D/2 (high nibble)."""
    x = rng.normal(size=(1, 64)).astype(np.float32)
    q, s = QuantKV4.quantize(jnp.asarray(x))
    qb = np.asarray(q)[0]
    lo = (qb & 0x0F).astype(np.int32) - 8
    hi = (qb >> 4).astype(np.int32) - 8
    ref = np.round(x[0] / np.asarray(s)[0]).clip(-8, 7)
    np.testing.assert_array_equal(lo, ref[:32])
    np.testing.assert_array_equal(hi, ref[32:])


def test_write_at_offsets(rng):
    cfg = ModelConfig(n_layers=2, n_heads=4, n_kv_heads=2, head_dim=64, dim=256)
    cache = QuantKV4.zeros(cfg, batch=2, max_seq=8)
    k = rng.normal(size=(2, 3, 2, 64)).astype(np.float32)
    v = rng.normal(size=(2, 3, 2, 64)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray([0, 2], np.int32))
    kf = np.asarray(cache.k_full(0, jnp.float32))
    # 4-bit error bound: amax/14 per head vector (amax ~3.5 for N(0,1)^64)
    np.testing.assert_allclose(kf[0, :, 0:3], k[0].transpose(1, 0, 2),
                               atol=0.3, rtol=0.0)
    np.testing.assert_allclose(kf[1, :, 2:5], k[1].transpose(1, 0, 2),
                               atol=0.3, rtol=0.0)
    assert (kf[0, :, 3:] == 0).all()
    assert (kf[1, :, :2] == 0).all()
    assert (np.asarray(cache.k_full(1, jnp.float32)) == 0).all()


def test_flash_q4_matches_xla_fallback(rng):
    """The q4 flash kernel (interpret mode on CPU) must match masked-softmax
    attention over the dequantized cache."""
    from llama_gguf_inference_tpu.ops.flash_attention import flash_attention_q4
    B, T, H, KVH, D, S = 2, 1, 4, 2, 128, 256
    cfg = ModelConfig(n_layers=1, n_heads=H, n_kv_heads=KVH, head_dim=D,
                      dim=H * D)
    cache = QuantKV4.zeros(cfg, batch=B, max_seq=S)
    k = rng.normal(size=(B, S - 8, KVH, D)).astype(np.float32)
    v = rng.normal(size=(B, S - 8, KVH, D)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v),
                        jnp.zeros(B, jnp.int32))
    offsets = jnp.asarray([S - 9, 100], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)

    got = np.asarray(flash_attention_q4(
        q, cache.k_q[0], cache.k_s[0], cache.v_q[0], cache.v_s[0], offsets))

    kc = np.asarray(cache.k_full(0, jnp.float32))
    vc = np.asarray(cache.v_full(0, jnp.float32))
    group = H // KVH
    qh = np.asarray(q).reshape(B, T, KVH, group, D)
    scores = np.einsum("btkgd,bksd->bkgts", qh, kc) / np.sqrt(D)
    pos = np.arange(S)[None, None, :]
    mask = pos[0] <= (np.asarray(offsets)[:, None] + np.arange(T)[None, :])[..., None]
    scores = np.where(mask[:, None, None], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("bkgts,bksd->btkgd", probs, vc).reshape(B, T, H, D)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_generation_q4_close_to_bf16(tmp_path):
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    p = SamplingParams(temperature=0.0, max_tokens=8)

    def gen(kv):
        eng = InferenceEngine(str(path), EngineConfig(
            max_slots=1, ctx=64, prefill_buckets=(16,), mode="dense",
            kv_dtype=kv))
        eng.start()
        try:
            return [ev.token_id for ev in eng.generate("hello world", p)]
        finally:
            eng.stop()

    bf = gen(jnp.bfloat16)
    q4 = gen("q4_0")
    # 4-bit KV rounding diverges sooner than q8 on a random-weight model;
    # the first token (largest logit gap) must agree and lengths match
    assert q4[0] == bf[0]
    assert len(q4) == len(bf)


def test_sharded_q4_cache(tmp_path):
    """QuantKV4 leaves shard rank-aware on a (dp, tp) mesh; engine tokens
    match the single-device q4 engine."""
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256)
    p = SamplingParams(temperature=0.0, max_tokens=6)

    def gen(**kw):
        eng = InferenceEngine(str(path), EngineConfig(
            max_slots=2, ctx=64, prefill_buckets=(16,), mode="dense",
            kv_dtype="q4_0", **kw))
        eng.start()
        try:
            return [ev.token_id for ev in eng.generate("hello world", p)]
        finally:
            eng.stop()

    single = gen()
    sharded = gen(tp=4, dp=2)
    assert sharded == single
