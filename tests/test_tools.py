"""quantize CLI + perplexity harness tests (SURVEY §7 steps 9-10 tooling)."""

import math

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf import GGMLType, GGUFReader
from llama_gguf_inference_tpu.tools.perplexity import perplexity
from llama_gguf_inference_tpu.tools.quantize import quantize_file
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("q") / "f32.gguf"
    write_tiny_llama(p, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=256, quant=GGMLType.F32)
    return p


def test_quantize_q4km(f32_model, tmp_path):
    dst = tmp_path / "q4km.gguf"
    stats = quantize_file(str(f32_model), str(dst), "Q4_K_M", verbose=False)
    assert stats["out_bytes"] < stats["in_bytes"] / 3
    r = GGUFReader(dst)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    # metadata preserved
    assert r.metadata["general.architecture"] == "llama"
    # values close to source
    src = GGUFReader(f32_model)
    a = src.tensor_f32("blk.0.ffn_up.weight")
    b = r.tensor_f32("blk.0.ffn_up.weight")
    assert np.abs(a - b).max() < 0.15 * np.abs(a).max()
    r.close(); src.close()


def test_quantized_model_loads_and_runs(f32_model, tmp_path):
    from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
    dst = tmp_path / "q8.gguf"
    quantize_file(str(f32_model), str(dst), "Q8_0", verbose=False)
    eng = InferenceEngine(str(dst), EngineConfig(max_slots=1, ctx=64,
                                                 prefill_buckets=(16,),
                                                 mode="quant"))
    eng.start()
    try:
        out = eng.generate_text("hello", SamplingParams(temperature=0, max_tokens=3))
        assert isinstance(out, str)
    finally:
        eng.stop()


def test_perplexity_and_delta(f32_model, tmp_path):
    text = "the quick brown fox jumps over the lazy dog " * 30
    ppl_f32, n = perplexity(str(f32_model), text, ctx=64, mode="dense")
    assert n > 100
    assert math.isfinite(ppl_f32) and ppl_f32 > 1.0

    dst = tmp_path / "q8.gguf"
    quantize_file(str(f32_model), str(dst), "Q8_0", verbose=False)
    ppl_q8, _ = perplexity(str(dst), text, ctx=64, mode="quant")
    # q8_0 on a tiny random model: quantization-induced ppl drift is small
    assert abs(ppl_q8 - ppl_f32) / ppl_f32 < 0.05
