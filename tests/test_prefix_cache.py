"""Slot prompt caching (llama-server parity): freed slots keep their KV,
admission picks the best-matching slot, and only the prompt suffix
prefills.  Token parity with a cold engine is the correctness pin."""

import time

import pytest

from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from llama_gguf_inference_tpu.utils.testing import write_tiny_llama
    p = tmp_path_factory.mktemp("pc") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    return str(p)


def _engine(model, **kw):
    cfg = dict(max_slots=2, ctx=256, prefill_buckets=(16, 64),
               mode="dense")
    cfg.update(kw)
    eng = InferenceEngine(model, EngineConfig(**cfg))
    eng.start()
    return eng


def _toks(eng, prompt, n=8):
    return [e.token_id for e in
            eng.generate(prompt, SamplingParams(temperature=0.0,
                                                max_tokens=n))
            if e.token_id >= 0]


def test_identical_prompt_reuses_and_matches(model):
    prompt = list(range(3, 80))
    eng = _engine(model)
    first = _toks(eng, prompt)
    assert eng.total_prefix_reused == 0
    second = _toks(eng, prompt)
    # all but the final prompt position skipped
    assert eng.total_prefix_reused == len(prompt) - 1
    assert second == first
    assert eng.stats()["prefix_tokens_reused"] == len(prompt) - 1
    eng.stop()


def test_shared_system_prefix_matches_cold_engine(model):
    sys_prefix = list(range(3, 70))                  # 67 shared tokens
    tail_a, tail_b = [100, 101, 102], [150, 151, 152, 153]

    warm = _engine(model)
    _toks(warm, sys_prefix + tail_a)
    reused_before = warm.total_prefix_reused
    got = _toks(warm, sys_prefix + tail_b)
    assert warm.total_prefix_reused - reused_before == len(sys_prefix)
    warm.stop()

    cold = _engine(model)
    want = _toks(cold, sys_prefix + tail_b)
    cold.stop()
    assert got == want


def test_best_matching_slot_chosen(model):
    """Two freed slots with different cached prompts: the request must land
    on the one with the longer common prefix."""
    pa = list(range(3, 60))
    pb = list(range(60, 120))
    eng = _engine(model)
    _toks(eng, pa)        # lands in slot 0
    _toks(eng, pb)        # slot 0 now caches pa; picker prefers slot 1 only
                          # if empty-vs-match ordering holds (both free)
    base = eng.total_prefix_reused
    _toks(eng, pb + [7, 8])
    assert eng.total_prefix_reused - base >= len(pb) - 1
    eng.stop()


def test_generated_tokens_extend_the_claim(model):
    """A follow-up turn = old prompt + old completion + new text; the
    freed slot's claim covers prompt AND fed-back generated tokens."""
    prompt = list(range(3, 50))
    eng = _engine(model)
    evs = list(eng.generate(prompt, SamplingParams(temperature=0.0,
                                                   max_tokens=6)))
    gen = [e.token_id for e in evs if e.token_id >= 0]
    base = eng.total_prefix_reused
    follow = prompt + gen + [200, 201]
    got = _toks(eng, follow)
    # prompt + all generated-but-last are reusable
    assert eng.total_prefix_reused - base >= len(prompt) + len(gen) - 1
    cold = _engine(model)
    want = _toks(cold, follow)
    cold.stop()
    assert got == want
    eng.stop()


def test_prefix_cache_disabled(model):
    prompt = list(range(3, 60))
    eng = _engine(model, prefix_cache=False)
    _toks(eng, prompt)
    _toks(eng, prompt)
    assert eng.total_prefix_reused == 0
    eng.stop()


def test_paged_layout_never_reuses(model):
    prompt = list(range(3, 60))
    eng = _engine(model, kv_layout="paged", kv_page_size=64)
    _toks(eng, prompt)
    _toks(eng, prompt)
    assert eng.total_prefix_reused == 0
    eng.stop()


def test_warmup_async_compiles_and_serves(model):
    eng = _engine(model)
    t = eng.warmup_async()
    t.join(timeout=300)
    assert not t.is_alive()
    assert eng.total_generated > 0          # warmup drained real requests
    # engine still healthy afterwards
    assert _toks(eng, list(range(3, 30)), n=4)
    eng.stop()


def test_reuse_after_concurrent_decode_matches_cold(model):
    """Regression (round-2 review finding #1): while request A decodes,
    the batched step also writes KV for FREE slot rows; with offsets 0
    those writes scribbled over slot B's cached prompt prefix, so reusing
    it produced corrupted tokens.  Free rows now park past their claim."""
    import threading
    from llama_gguf_inference_tpu.runtime.engine import (EngineConfig,
                                                         InferenceEngine)

    pb = list(range(3, 70))
    pa = list(range(100, 140))

    def run(prefix_on):
        eng = InferenceEngine(model, EngineConfig(
            max_slots=2, ctx=128, prefill_buckets=(16, 64), mode="dense",
            multi_step=4, prefix_cache=prefix_on))
        eng.start()
        _toks(eng, pb)                       # B fills a slot, then frees it
        done = threading.Event()

        def long_a():
            _toks(eng, pa, n=40)             # A decodes many bursts while
            done.set()                       # B's slot sits free

        t = threading.Thread(target=long_a)
        t.start()
        time.sleep(0.5)                      # let A's decode bursts run
        out = _toks(eng, pb)                 # resubmit B mid-decode
        t.join(timeout=120)
        assert done.is_set()
        reused = eng.total_prefix_reused
        eng.stop()
        return out, reused

    warm, reused = run(True)
    assert reused >= len(pb) - 1             # the reuse path actually ran
    cold, _ = run(False)
    assert warm == cold
