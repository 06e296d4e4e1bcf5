"""OpenAI logprobs support through the whole stack (real engine, no mock)."""

import asyncio
import json
import math

import pytest

from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.serving.openai_server import BackendConfig, OpenAIServer
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

from test_serving_stack import http_request


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    p = tmp_path_factory.mktemp("lp") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=96)
    eng = InferenceEngine(str(p), EngineConfig(max_slots=1, ctx=64,
                                               prefill_buckets=(16,),
                                               mode="dense"))
    eng.start()
    yield eng
    eng.stop()


def test_engine_emits_logprobs(engine):
    evs = list(engine.generate("hello world",
                               SamplingParams(temperature=0.0, max_tokens=4,
                                              n_probs=3)))
    for ev in evs:
        assert ev.logprob is not None and ev.logprob <= 0.0
        assert ev.top_logprobs is not None and len(ev.top_logprobs) == 3
        # entries sorted descending; chosen token's lp <= best
        lps = [lp for _, lp in ev.top_logprobs]
        assert lps == sorted(lps, reverse=True)
        # greedy: chosen token must be the argmax -> equals top-1
        assert math.isclose(ev.logprob, lps[0], rel_tol=1e-3, abs_tol=1e-3)


def test_engine_no_logprobs_by_default(engine):
    evs = list(engine.generate("hello",
                               SamplingParams(temperature=0.0, max_tokens=2)))
    assert all(ev.top_logprobs is None for ev in evs)


async def test_chat_api_logprobs(engine):
    srv = OpenAIServer(engine, BackendConfig(host="127.0.0.1", port=0, api_key=""))
    await srv.start()
    try:
        req = json.dumps({
            "model": "any",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0,
            "logprobs": True, "top_logprobs": 2,
        }).encode()
        status, _, body = await http_request(
            srv.port, "POST", "/v1/chat/completions",
            headers={"Content-Type": "application/json"}, body=req)
        assert status == 200
        data = json.loads(body)
        lp = data["choices"][0]["logprobs"]["content"]
        assert len(lp) == 3
        assert all(len(e["top_logprobs"]) == 2 for e in lp)
        assert all(e["logprob"] <= 0.0 for e in lp)
        assert isinstance(lp[0]["bytes"], list)
    finally:
        await srv.close()
