"""q4_1 KV cache (llama.cpp ``--cache-type-k q4_1`` equivalent): asymmetric
packed codec accuracy, affine flash-kernel parity with the XLA dequant path,
end-to-end generation parity with bf16, and the q5_x -> q8_0 env alias."""

import numpy as np
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.models.config import ModelConfig
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV41
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def test_quantize_roundtrip(rng):
    x = rng.normal(size=(2, 5, 4, 64)).astype(np.float32)
    q, s, m = QuantKV41.quantize(jnp.asarray(x))
    assert q.shape == (2, 5, 4, 32) and q.dtype == jnp.uint8
    assert s.shape == (2, 5, 4) and m.shape == (2, 5, 4)
    y = np.asarray(QuantKV41.dequantize(q, s, m, jnp.float32))
    # 4-bit affine: |err| <= s/2 = (max-min)/30 per element
    span = x.max(axis=-1, keepdims=True) - x.min(axis=-1, keepdims=True)
    assert (np.abs(y - x) <= span / 30 + 1e-6).all()
    # zero vectors stay zero with no NaN
    q, s, m = QuantKV41.quantize(jnp.zeros((1, 1, 1, 64)))
    out = np.asarray(QuantKV41.dequantize(q, s, m, jnp.float32))
    assert np.isfinite(out).all() and (out == 0).all()


def test_affine_beats_symmetric_on_one_sided_vectors(rng):
    """The asymmetric grid's reason to exist: a one-sided (all-positive)
    vector wastes half of q4_0's signed range but spans q4_1's full
    [min, max] grid."""
    from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV4
    x = np.abs(rng.normal(size=(1, 1, 8, 64))).astype(np.float32) + 1.0
    xj = jnp.asarray(x)
    q0, s0 = QuantKV4.quantize(xj)
    y0 = np.asarray(QuantKV4.dequantize(q0, s0, jnp.float32))
    q1, s1, m1 = QuantKV41.quantize(xj)
    y1 = np.asarray(QuantKV41.dequantize(q1, s1, m1, jnp.float32))
    assert np.abs(y1 - x).max() < np.abs(y0 - x).max()


def test_packing_is_planar(rng):
    """Byte j holds element j (low nibble) and j + D/2 (high nibble),
    codes unsigned [0, 15]."""
    x = rng.normal(size=(1, 64)).astype(np.float32)
    q, s, m = QuantKV41.quantize(jnp.asarray(x))
    qb = np.asarray(q)[0]
    lo = (qb & 0x0F).astype(np.int32)
    hi = (qb >> 4).astype(np.int32)
    ref = np.round((x[0] - np.asarray(m)[0]) / np.asarray(s)[0]).clip(0, 15)
    np.testing.assert_array_equal(lo, ref[:32])
    np.testing.assert_array_equal(hi, ref[32:])


def test_write_at_offsets(rng):
    cfg = ModelConfig(n_layers=2, n_heads=4, n_kv_heads=2, head_dim=64, dim=256)
    cache = QuantKV41.zeros(cfg, batch=2, max_seq=8)
    k = rng.normal(size=(2, 3, 2, 64)).astype(np.float32)
    v = rng.normal(size=(2, 3, 2, 64)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray([0, 2], np.int32))
    kf = np.asarray(cache.k_full(0, jnp.float32))
    np.testing.assert_allclose(kf[0, :, 0:3], k[0].transpose(1, 0, 2),
                               atol=0.3, rtol=0.0)
    np.testing.assert_allclose(kf[1, :, 2:5], k[1].transpose(1, 0, 2),
                               atol=0.3, rtol=0.0)
    assert (kf[0, :, 3:] == 0).all()
    assert (kf[1, :, :2] == 0).all()
    assert (np.asarray(cache.k_full(1, jnp.float32)) == 0).all()


def test_flash_q41_matches_xla_fallback(rng):
    """The affine flash kernel (interpret mode on CPU) must match
    masked-softmax attention over the dequantized cache — this pins the
    rank-1 ``qsum x k_min`` score term and the ``p.v_min`` output term."""
    from llama_gguf_inference_tpu.ops.flash_attention import flash_attention_q41
    B, T, H, KVH, D, S = 2, 1, 4, 2, 128, 256
    cfg = ModelConfig(n_layers=1, n_heads=H, n_kv_heads=KVH, head_dim=D,
                      dim=H * D)
    cache = QuantKV41.zeros(cfg, batch=B, max_seq=S)
    # biased +0.5 so the mins are genuinely non-zero
    k = (rng.normal(size=(B, S - 8, KVH, D)) + 0.5).astype(np.float32)
    v = (rng.normal(size=(B, S - 8, KVH, D)) + 0.5).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v),
                        jnp.zeros(B, jnp.int32))
    offsets = jnp.asarray([S - 9, 100], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)

    got = np.asarray(flash_attention_q41(
        q, cache.k_q[0], cache.k_s[0], cache.k_m[0],
        cache.v_q[0], cache.v_s[0], cache.v_m[0], offsets))

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


def test_multi_token_prefill_flash_q41(rng):
    """T > 1 exercises the per-row causal mask interacting with the
    affine terms (each query row sums a different prob row over v_min)."""
    from llama_gguf_inference_tpu.ops.flash_attention import flash_attention_q41
    B, T, H, KVH, D, S = 1, 4, 4, 2, 128, 256
    cfg = ModelConfig(n_layers=1, n_heads=H, n_kv_heads=KVH, head_dim=D,
                      dim=H * D)
    cache = QuantKV41.zeros(cfg, batch=B, max_seq=S)
    k = (rng.normal(size=(B, 16, KVH, D)) - 0.7).astype(np.float32)
    v = (rng.normal(size=(B, 16, KVH, D)) - 0.7).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v),
                        jnp.zeros(B, jnp.int32))
    offsets = jnp.asarray([12 - T], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)

    got = np.asarray(flash_attention_q41(
        q, cache.k_q[0], cache.k_s[0], cache.k_m[0],
        cache.v_q[0], cache.v_s[0], cache.v_m[0], offsets))

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


def test_generation_q41_close_to_bf16(tmp_path):
    """Engine e2e: q4_1 either picks bf16's greedy first token or a token
    whose bf16 logit is within the 4-bit noise band of the winner (the
    tiny random model's top-2 sit ~0.03 apart — inside the quant error, so
    exact-token equality would pin a coin flip)."""
    from llama_gguf_inference_tpu.models.llama import KVCache, forward
    from llama_gguf_inference_tpu.runtime import tokenizer as tok_mod
    from llama_gguf_inference_tpu.runtime.loader import load_model

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
    q41 = gen("q4_1")
    assert len(q41) == len(bf)
    if q41[0] != bf[0]:
        cfg, params, reader = load_model(path, mode="dense")
        tok = tok_mod.from_gguf_metadata(reader.metadata)
        reader.close()
        ids = tok.encode("hello world")
        logits, _ = forward(params, cfg,
                            jnp.asarray([ids], jnp.int32),
                            jnp.zeros(1, jnp.int32),
                            KVCache.zeros(cfg, 1, 32),
                            jnp.full(1, len(ids), jnp.int32))
        row = np.asarray(logits)[0, len(ids) - 1].astype(np.float64)
        assert row[bf[0]] - row[q41[0]] < 0.15, \
            (bf[0], q41[0], row[bf[0]], row[q41[0]])


def test_sharded_q41_cache(tmp_path):
    """QuantKV41 leaves (incl. the extra rank-3 min planes) shard
    rank-aware on a (dp, tp) mesh; engine tokens match single-device."""
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256)
    p = SamplingParams(temperature=0.0, max_tokens=6)

    def gen(**kw):
        eng = InferenceEngine(str(path), EngineConfig(
            max_slots=2, ctx=64, prefill_buckets=(16,), mode="dense",
            kv_dtype="q4_1", **kw))
        eng.start()
        try:
            return [ev.token_id for ev in eng.generate("hello world", p)]
        finally:
            eng.stop()

    single = gen()
    sharded = gen(tp=4, dp=2)
    assert sharded == single


def test_q5_env_alias_maps_to_q8(monkeypatch, tmp_path):
    """llama-server accepts --cache-type q5_0/q5_1; the TPU backend honors
    the config at q8_0 (no efficient 5-bit layout) instead of failing."""
    from llama_gguf_inference_tpu.serving import openai_server

    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    monkeypatch.setenv("KV_CACHE_TYPE", "q5_0")
    monkeypatch.setenv("MODEL_PATH", str(path))
    monkeypatch.delenv("MOCK_BACKEND", raising=False)
    captured = {}

    class FakeEngine:
        def __init__(self, p, ecfg, **kw):
            captured["kv_dtype"] = ecfg.kv_dtype
            raise RuntimeError("stop-after-config")

    monkeypatch.setattr(
        "llama_gguf_inference_tpu.runtime.engine.InferenceEngine", FakeEngine)
    try:
        openai_server.main()   # imports InferenceEngine at call time
    except RuntimeError:
        pass
    assert captured["kv_dtype"] == "q8_0"
