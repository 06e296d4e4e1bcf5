"""Context shift (llama-server --ctx-shift): generation continues past the
slot's KV capacity by discarding the oldest window and re-roping cached K."""

import numpy as np
import pytest

import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.models.llama import (
    KVCache, forward, shift_cache_slot,
)
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def test_shift_rolls_and_reropes_the_cache(tmp_path, rng):
    """The shift guarantees: positions below ``keep`` untouched; V beyond
    ``keep`` is an EXACT roll of the original cache; K beyond ``keep`` is
    the rolled original rotated by the position delta.  Layer 0's K (which
    is token-local: no attention feeds it) additionally equals a fresh
    prefill of the truncated sequence — the end-to-end rope check.
    (Deeper layers legitimately differ from a fresh truncated prefill:
    their cached values were computed while the discarded window was still
    visible — inherent to context shifting, same as llama.cpp's K-shift.)
    """
    from llama_gguf_inference_tpu.models.llama import apply_rope, rope_angles

    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    cfg, params, r = load_model(p, mode="dense")
    r.close()

    ids = rng.integers(5, 250, size=(1, 24)).astype(np.int32)
    keep, discard = 6, 8
    S = 32
    cache = KVCache.zeros(cfg, 1, S)
    _, cache = forward(params, cfg, jnp.asarray(ids),
                       jnp.zeros(1, jnp.int32), cache,
                       jnp.full(1, 24, jnp.int32))
    shifted = shift_cache_slot(cache, cfg, jnp.int32(0), jnp.int32(keep),
                               jnp.int32(discard))

    n_valid = 24 - discard
    cos_d, sin_d = rope_angles(jnp.full((1, 1), discard, jnp.float32),
                               cfg.head_dim, cfg.rope_dim, cfg.rope_base, cfg)
    for li in range(cfg.n_layers):
        orig_k = np.asarray(cache.k[li][0], np.float32)     # (KVH, S, D)
        orig_v = np.asarray(cache.v[li][0], np.float32)
        got_k = np.asarray(shifted.k[li][0], np.float32)
        got_v = np.asarray(shifted.v[li][0], np.float32)
        # below keep: bit-identical
        np.testing.assert_array_equal(got_k[:, :keep], orig_k[:, :keep])
        np.testing.assert_array_equal(got_v[:, :keep], orig_v[:, :keep])
        # V: exact roll
        np.testing.assert_array_equal(got_v[:, keep:n_valid],
                                      orig_v[:, keep + discard:24])
        # K: rolled + rotated by -delta
        rolled = jnp.asarray(orig_k[:, keep + discard:24])
        want_k = np.asarray(apply_rope(
            rolled.transpose(1, 0, 2)[None], cos_d, -sin_d,
            cfg.rope_interleaved)[0].transpose(1, 0, 2))
        np.testing.assert_allclose(got_k[:, keep:n_valid], want_k,
                                   atol=0.01, rtol=0.01)

    # layer 0 K is token-local: must ALSO match a fresh truncated prefill
    trunc = np.concatenate([ids[:, :keep], ids[:, keep + discard:]], axis=1)
    ref = KVCache.zeros(cfg, 1, S)
    _, ref = forward(params, cfg, jnp.asarray(trunc),
                     jnp.zeros(1, jnp.int32), ref,
                     jnp.full(1, trunc.shape[1], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(shifted.k[0][0, :, :n_valid], np.float32),
        np.asarray(ref.k[0][0, :, :n_valid], np.float32),
        atol=0.02, rtol=0.02)


def test_engine_generates_past_capacity(tmp_path):
    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0)
    eng = InferenceEngine(str(p), EngineConfig(
        max_slots=1, ctx=48, prefill_buckets=(16,), mode="quant",
        multi_step=4, ctx_shift=True))
    eng.start()
    try:
        evs = list(eng.generate(list(range(5, 25)),
                                SamplingParams(temperature=0.0,
                                               max_tokens=120)))
        toks = [e.token_id for e in evs if e.token_id >= 0]
        # without shift, a 48-token slot caps generation at ~28 tokens
        assert len(toks) == 120
        assert evs[-1].finish_reason == "length"   # max_tokens, not capacity
        assert eng.stats()["ctx_shifts"] >= 1
    finally:
        eng.stop()


def test_engine_without_shift_finishes_at_capacity(tmp_path):
    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0)
    eng = InferenceEngine(str(p), EngineConfig(
        max_slots=1, ctx=48, prefill_buckets=(16,), mode="quant",
        multi_step=4))
    eng.start()
    try:
        evs = list(eng.generate(list(range(5, 25)),
                                SamplingParams(temperature=0.0,
                                               max_tokens=120)))
        toks = [e.token_id for e in evs if e.token_id >= 0]
        assert len(toks) < 40 and evs[-1].finish_reason == "length"
    finally:
        eng.stop()


def test_shift_prefix_matches_no_shift(tmp_path):
    """Tokens BEFORE the first shift are identical to the no-shift engine
    (the shift must not perturb earlier decoding)."""
    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0)

    def run(shift):
        eng = InferenceEngine(str(p), EngineConfig(
            max_slots=1, ctx=48, prefill_buckets=(16,), mode="quant",
            multi_step=4, ctx_shift=shift))
        eng.start()
        try:
            return [e.token_id for e in eng.generate(
                list(range(5, 25)), SamplingParams(temperature=0.0,
                                                   max_tokens=60))
                    if e.token_id >= 0]
        finally:
            eng.stop()

    plain = run(False)
    shifted = run(True)
    assert shifted[:len(plain) - 4] == plain[:-4]   # pre-shift prefix equal


def test_ctx_shift_rejected_combinations(tmp_path):
    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    base = dict(max_slots=1, ctx=64, prefill_buckets=(16,), mode="quant",
                ctx_shift=True)
    with pytest.raises(ValueError, match="contig"):
        InferenceEngine(str(p), EngineConfig(kv_layout="paged", **base))
    with pytest.raises(ValueError, match="spec"):
        InferenceEngine(str(p), EngineConfig(spec_ngram=True, **base))
    swa = tmp_path / "swa.gguf"
    write_tiny_llama(swa, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, arch="gemma2", sliding_window=16)
    with pytest.raises(ValueError, match="sliding"):
        InferenceEngine(str(swa), EngineConfig(**base))


@pytest.mark.parametrize("kv", ["q8_0", "q4_0", "q4_1"])
def test_shift_quantized_kv(tmp_path, rng, kv):
    """r4 (VERDICT r3 #7): ctx_shift composes with quantized KV.  Kept
    positions stay BIT-identical (codes selected, not requantized); V
    beyond keep is an exact roll of codes+scales; K beyond keep matches
    the bf16-path shift within one requant step of noise."""
    from llama_gguf_inference_tpu.runtime.kv_cache import (
        QuantKV, QuantKV4, QuantKV41,
    )
    cls = {"q8_0": QuantKV, "q4_0": QuantKV4, "q4_1": QuantKV41}[kv]

    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    cfg, params, r = load_model(p, mode="dense")
    r.close()

    ids = rng.integers(5, 250, size=(1, 24)).astype(np.int32)
    keep, discard = 6, 8
    S = 32
    cache = cls.zeros(cfg, 1, S)
    _, cache = forward(params, cfg, jnp.asarray(ids),
                       jnp.zeros(1, jnp.int32), cache,
                       jnp.full(1, 24, jnp.int32))
    shifted = shift_cache_slot(cache, cfg, jnp.int32(0), jnp.int32(keep),
                               jnp.int32(discard))
    assert isinstance(shifted, cls)

    n_valid = 24 - discard
    for li in range(cfg.n_layers):
        # below keep: codes + scales bit-identical (never requantized)
        for f in cache._fields:
            orig = np.asarray(getattr(cache, f)[li][0])
            got = np.asarray(getattr(shifted, f)[li][0])
            np.testing.assert_array_equal(got[:, :keep], orig[:, :keep],
                                          err_msg=f"{kv} {f} kept region")
        # V: exact roll of codes and scales
        for f in [f_ for f_ in cache._fields if f_.startswith("v_")]:
            orig = np.asarray(getattr(cache, f)[li][0])
            got = np.asarray(getattr(shifted, f)[li][0])
            np.testing.assert_array_equal(
                got[:, keep:n_valid], orig[:, keep + discard:24],
                err_msg=f"{kv} {f} rolled region")
        # K: dequantized values match the rolled+re-roped dequant of the
        # original within one requant step (absmax grid spacing)
        from llama_gguf_inference_tpu.models.llama import apply_rope, rope_angles
        cos_d, sin_d = rope_angles(jnp.full((1, 1), discard, jnp.float32),
                                   cfg.head_dim, cfg.rope_dim,
                                   cfg.rope_base, cfg)
        got_k = np.asarray(shifted.k_full(li)[0], np.float32)
        orig_k = np.asarray(cache.k_full(li)[0], np.float32)
        rolled = jnp.asarray(orig_k[:, keep + discard:24])
        want = np.asarray(apply_rope(
            rolled.transpose(1, 0, 2)[None], cos_d, -sin_d,
            cfg.rope_interleaved)[0].transpose(1, 0, 2))
        bits = {"q8_0": 127.0, "q4_0": 7.0, "q4_1": 7.5}[kv]
        step = np.abs(want).max(axis=-1, keepdims=True) / bits
        assert (np.abs(got_k[:, keep:n_valid] - want)
                <= step + 0.02).all(), f"{kv} requant error too large"


@pytest.mark.parametrize("kv", ["q8_0", "q4_1"])
def test_engine_generates_past_capacity_quantized(tmp_path, kv):
    """End-to-end: the engine shifts a quantized cache and keeps
    generating to max_tokens (llama-server --ctx-shift with
    --cache-type-k q8_0 behavior)."""
    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    eng = InferenceEngine(str(p), EngineConfig(
        max_slots=1, ctx=64, prefill_buckets=(16,), mode="quant",
        multi_step=4, ctx_shift=True, kv_dtype=kv))
    eng.start()
    try:
        evs = list(eng.generate([3, 9, 4, 7], SamplingParams(
            temperature=0.0, max_tokens=120)))
        toks = [e.token_id for e in evs]
        assert len(toks) == 120
        assert evs[-1].finish_reason == "length"
        assert eng.stats()["ctx_shifts"] >= 1
    finally:
        eng.stop()
