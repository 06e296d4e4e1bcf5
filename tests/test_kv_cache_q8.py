"""q8_0 KV cache: codec accuracy + end-to-end generation parity with bf16."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_gguf_inference_tpu.runtime.kv_cache import QuantKV
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def test_quantize_roundtrip(rng):
    x = rng.normal(size=(2, 5, 4, 64)).astype(np.float32)
    q, s = QuantKV.quantize(jnp.asarray(x))
    y = np.asarray(QuantKV.dequantize(q, s, jnp.float32))
    assert np.abs(y - x).max() < 0.01 * np.abs(x).max()
    # zero vectors stay zero with no NaN
    q, s = QuantKV.quantize(jnp.zeros((1, 1, 1, 64)))
    assert np.isfinite(np.asarray(QuantKV.dequantize(q, s, jnp.float32))).all()


def test_write_at_offsets(rng):
    from llama_gguf_inference_tpu.models.config import ModelConfig
    cfg = ModelConfig(n_layers=2, n_heads=4, n_kv_heads=2, head_dim=64, dim=256)
    cache = QuantKV.zeros(cfg, batch=2, max_seq=8)
    k = rng.normal(size=(2, 3, 2, 64)).astype(np.float32)
    v = rng.normal(size=(2, 3, 2, 64)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray([0, 2], np.int32))
    kf = np.asarray(cache.k_full(0, jnp.float32))   # (B, H, S, D) layout
    np.testing.assert_allclose(kf[0, :, 0:3], k[0].transpose(1, 0, 2),
                               atol=0.02, rtol=0.02)
    np.testing.assert_allclose(kf[1, :, 2:5], k[1].transpose(1, 0, 2),
                               atol=0.02, rtol=0.02)
    assert (kf[0, :, 3:] == 0).all()
    assert (kf[1, :, :2] == 0).all()
    # layer 1 untouched
    assert (np.asarray(cache.k_full(1, jnp.float32)) == 0).all()


def test_generation_q8_close_to_bf16(tmp_path):
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=96)
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
    q8 = gen("q8_0")
    # q8 rounding may diverge late in a random-weight model; the first tokens
    # (where logit gaps are real) must agree
    assert q8[:2] == bf[:2]
    assert len(q8) == len(bf)
