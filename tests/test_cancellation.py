"""Request cancellation: client disconnect frees the slot promptly."""

import time

import pytest

from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    p = tmp_path_factory.mktemp("c") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=96)
    eng = InferenceEngine(str(p), EngineConfig(max_slots=1, ctx=512,
                                               prefill_buckets=(16,),
                                               mode="dense"))
    eng.start()
    yield eng
    eng.stop()


def test_cancel_active_request_frees_slot(engine):
    rid, out = engine.submit("hello world",
                             SamplingParams(temperature=0.0, max_tokens=400))
    # let it start generating
    ev = out.get(timeout=120)
    assert not ev.finished
    engine.cancel(rid)
    # terminal event arrives promptly (well before 400 tokens' worth)
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        ev = out.get(timeout=30)
        if ev.finished:
            break
    assert ev.finished
    assert engine.n_active() == 0

    # slot reusable immediately
    txt = engine.generate_text("the quick",
                               SamplingParams(temperature=0.0, max_tokens=3))
    assert isinstance(txt, str)


def test_cancel_queued_request(engine):
    # occupy the single slot
    rid1, out1 = engine.submit("hello", SamplingParams(temperature=0.0,
                                                       max_tokens=200))
    out1.get(timeout=120)
    # queue a second and cancel it before it's admitted
    rid2, out2 = engine.submit("world", SamplingParams(temperature=0.0,
                                                       max_tokens=5))
    engine.cancel(rid2)
    ev = out2.get(timeout=60)
    assert ev.finished
    engine.cancel(rid1)
    while True:
        ev = out1.get(timeout=60)
        if ev.finished:
            break


def test_cancel_unknown_request_is_noop(engine):
    assert engine.cancel("nonexistent") is True
    # engine still healthy
    txt = engine.generate_text("hello", SamplingParams(temperature=0.0,
                                                       max_tokens=2))
    assert isinstance(txt, str)
