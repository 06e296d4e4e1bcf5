"""Engine tests: generation, streaming, continuous batching, stop handling."""

import queue
import threading

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=96)
    eng = InferenceEngine(str(path), EngineConfig(
        max_slots=2, ctx=128, prefill_buckets=(16, 32), mode="dense"))
    eng.start()
    yield eng
    eng.stop()


def test_greedy_generation_deterministic(engine):
    p = SamplingParams(temperature=0.0, max_tokens=8)
    out1 = [ev.token_id for ev in engine.generate("hello world", p)]
    out2 = [ev.token_id for ev in engine.generate("hello world", p)]
    assert out1 == out2
    assert 1 <= len(out1) <= 8


def test_stream_events_have_metadata(engine):
    p = SamplingParams(temperature=0.0, max_tokens=4)
    evs = list(engine.generate("the quick brown fox", p))
    assert evs[-1].finished
    assert evs[-1].finish_reason in ("stop", "length")
    assert all(ev.n_prompt > 0 for ev in evs)
    assert [ev.n_generated for ev in evs] == list(range(1, len(evs) + 1))


def test_max_tokens_respected(engine):
    p = SamplingParams(temperature=0.0, max_tokens=3)
    evs = list(engine.generate("hello", p))
    assert len(evs) == 3
    assert evs[-1].finish_reason in ("stop", "length")


def test_concurrent_requests_batched(engine):
    """More requests than slots; all must complete with consistent results."""
    p = SamplingParams(temperature=0.0, max_tokens=6)
    solo = [ev.token_id for ev in engine.generate("the lazy dog", p)]

    results = {}

    def worker(i, prompt):
        results[i] = [ev.token_id for ev in engine.generate(prompt, p)]

    threads = [threading.Thread(target=worker, args=(i, "the lazy dog"))
               for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 5
    for i in range(5):
        assert results[i] == solo, f"request {i} diverged under batching"


def test_sampled_generation_seed_reproducible(engine):
    p1 = SamplingParams(temperature=0.9, seed=42, max_tokens=8)
    p2 = SamplingParams(temperature=0.9, seed=42, max_tokens=8)
    p3 = SamplingParams(temperature=0.9, seed=43, max_tokens=8)
    a = [ev.token_id for ev in engine.generate("hello world", p1)]
    b = [ev.token_id for ev in engine.generate("hello world", p2)]
    c = [ev.token_id for ev in engine.generate("hello world", p3)]
    assert a == b
    # different seed normally diverges (not guaranteed; tiny model) — at
    # minimum it must complete
    assert len(c) >= 1


def test_stop_string(engine):
    # force the stop string to appear by using a stop that matches emitted text
    p = SamplingParams(temperature=0.0, max_tokens=20)
    full = engine.generate_text("the quick brown", p)
    if len(full) > 2:
        needle = full[1:3]
        p2 = SamplingParams(temperature=0.0, max_tokens=20, stop=(needle,))
        stopped = engine.generate_text("the quick brown", p2)
        assert needle not in stopped
        assert stopped == full.split(needle)[0]


def test_engine_stats(engine):
    s = engine.stats()
    assert s["slots_total"] == 2
    assert s["total_generated"] > 0
    assert s["ctx"] == 128


def test_batched_admission_parity(tmp_path_factory):
    """Concurrent admissions dispatch phase-1/phase-2 (deferred first-token
    sync, VERDICT r4 #4): queueing N requests before the scheduler runs must
    produce exactly the single-request outputs, including max_tokens=1
    requests that finish inside the deferred-finish pass."""
    path = tmp_path_factory.mktemp("ba") / "tiny.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    eng = InferenceEngine(str(path), EngineConfig(
        max_slots=4, ctx=128, prefill_buckets=(16, 32), mode="dense"))
    eng.start()
    try:
        prompts = ["the lazy dog", "hello world", "a b c d", "quick brown"]
        p = SamplingParams(temperature=0.0, max_tokens=5)
        solo = {pr: [ev.token_id for ev in eng.generate(pr, p)]
                for pr in prompts}
        # burst: all four hit the queue before one scheduler tick admits
        # them together through the two-phase path
        outs = [eng.submit(pr, SamplingParams(temperature=0.0, max_tokens=5))[1]
                for pr in prompts]
        for pr, out in zip(prompts, outs):
            toks = []
            while True:
                ev = out.get(timeout=120)
                toks.append(ev.token_id)
                if ev.finished:
                    break
            assert toks == solo[pr], f"burst admission diverged for {pr!r}"
        # max_tokens=1: _emit_token releases the slot inside the deferred
        # finish pass — state transitions must not resurrect it
        outs1 = [eng.submit(pr, SamplingParams(temperature=0.0, max_tokens=1))[1]
                 for pr in prompts]
        for pr, out in zip(prompts, outs1):
            ev = out.get(timeout=120)
            assert ev.finished and ev.token_id == solo[pr][0]
    finally:
        eng.stop()


def test_slot_churn_many_short_requests(engine):
    """Rapid slot reuse across many short requests stays consistent."""
    p = SamplingParams(temperature=0.0, max_tokens=2)
    first = [ev.token_id for ev in engine.generate("the dog", p)]
    for _ in range(10):
        assert [ev.token_id for ev in engine.generate("the dog", p)] == first


def test_interleaved_different_prompts(engine):
    """Concurrent different prompts must match their solo runs."""
    p = SamplingParams(temperature=0.0, max_tokens=5)
    prompts = ["hello world", "the quick brown fox", "lazy dog"]
    solo = {pr: [ev.token_id for ev in engine.generate(pr, p)] for pr in prompts}

    results = {}

    def worker(pr):
        results[pr] = [ev.token_id for ev in engine.generate(pr, p)]

    threads = [threading.Thread(target=worker, args=(pr,)) for pr in prompts
               for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for pr in prompts:
        assert results[pr] == solo[pr], f"{pr!r} diverged under interleaving"


def test_empty_prompt(engine):
    """Empty prompt still produces tokens (bos-only prefill)."""
    p = SamplingParams(temperature=0.0, max_tokens=2)
    evs = list(engine.generate("", p))
    assert len(evs) >= 1 and evs[-1].finished


def test_sampler_tail_through_engine(engine):
    """typical_p and mirostat ride the fused admission path (scal vector)
    end to end: deterministic per seed, and mirostat state resets per
    request (identical back-to-back outputs)."""
    p = SamplingParams(temperature=0.9, typical_p=0.6, seed=21, max_tokens=6)
    a = [ev.token_id for ev in engine.generate("hello world", p)]
    b = [ev.token_id for ev in engine.generate("hello world", p)]
    assert a == b and len(a) >= 1
    pm = SamplingParams(temperature=0.9, mirostat=2, mirostat_tau=3.0,
                        seed=22, max_tokens=8)
    c = [ev.token_id for ev in engine.generate("hello world", pm)]
    d = [ev.token_id for ev in engine.generate("hello world", pm)]
    assert c == d and len(c) >= 1


def test_slot_restore_into_fresh_engine(tmp_path_factory, tmp_path):
    """Cross-process slot persistence: a slot file saved from one engine
    restores into a brand-new engine (zeroed KV) and yields the same
    continuation via prefix reuse — proving the file carries the real KV
    bytes, not just the token list."""
    path = tmp_path_factory.mktemp("sr") / "tiny.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    prompt = list(range(3, 23))
    p = SamplingParams(temperature=0.0, max_tokens=4)
    cfg = EngineConfig(max_slots=2, ctx=128, prefill_buckets=(16, 32),
                       mode="dense")

    e1 = InferenceEngine(str(path), cfg)
    e1.start()
    try:
        base = [ev.token_id for ev in e1.generate(prompt, p)]
        b = next(i for i, s in enumerate(e1.slots) if s.cached_ids)
        # non-.npz filename: np.savez(str) would silently append ".npz"
        # and break the later restore (r5 review finding) — save through a
        # file object keeps the exact name
        out = e1.slot_op("save", b, str(tmp_path / "slot.bin"))
        assert out["n_saved"] > len(prompt)
        assert (tmp_path / "slot.bin").exists()
    finally:
        e1.stop()

    e2 = InferenceEngine(str(path), cfg)
    e2.start()
    try:
        got = e2.slot_op("restore", 0, str(tmp_path / "slot.bin"))
        assert got["n_restored"] == out["n_saved"]
        before = e2.total_prefix_reused
        again = [ev.token_id for ev in e2.generate(prompt, p)]
        assert again == base, "restored KV must reproduce the continuation"
        assert e2.total_prefix_reused > before
    finally:
        e2.stop()


def test_slot_save_q8_kv_roundtrip(tmp_path_factory, tmp_path):
    """Slot persistence generalizes over cache codecs (q8_0 contig)."""
    path = tmp_path_factory.mktemp("srq") / "tiny.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    prompt = list(range(5, 21))
    p = SamplingParams(temperature=0.0, max_tokens=3)
    cfg = EngineConfig(max_slots=2, ctx=128, prefill_buckets=(16,),
                       mode="dense", kv_dtype="q8_0")
    e1 = InferenceEngine(str(path), cfg)
    e1.start()
    try:
        base = [ev.token_id for ev in e1.generate(prompt, p)]
        b = next(i for i, s in enumerate(e1.slots) if s.cached_ids)
        e1.slot_op("save", b, str(tmp_path / "q8.npz"))
    finally:
        e1.stop()
    e2 = InferenceEngine(str(path), cfg)
    e2.start()
    try:
        e2.slot_op("restore", 1, str(tmp_path / "q8.npz"))
        assert [ev.token_id for ev in e2.generate(prompt, p)] == base
    finally:
        e2.stop()
