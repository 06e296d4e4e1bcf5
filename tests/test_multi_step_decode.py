"""Fused multi-step decode must produce the same tokens as single-step."""

import pytest

from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("m") / "t.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=96)
    return str(p)


def run(model_path, multi_step, prompt, p):
    eng = InferenceEngine(model_path, EngineConfig(
        max_slots=2, ctx=128, prefill_buckets=(16, 32), mode="dense",
        multi_step=multi_step))
    eng.start()
    try:
        return [ev.token_id for ev in eng.generate(prompt, p)]
    finally:
        eng.stop()


def test_multi_step_matches_single(model_path):
    p = SamplingParams(temperature=0.0, max_tokens=12)
    single = run(model_path, 1, "hello world", p)
    multi = run(model_path, 4, "hello world", p)
    assert multi == single


def test_multi_step_respects_max_tokens(model_path):
    p = SamplingParams(temperature=0.0, max_tokens=5)
    out = run(model_path, 8, "the quick", p)
    assert len(out) == 5


def test_multi_step_seeded_sampling(model_path):
    p = SamplingParams(temperature=0.8, seed=7, max_tokens=10)
    a = run(model_path, 4, "hello", p)
    b = run(model_path, 1, "hello", p)
    assert a == b
