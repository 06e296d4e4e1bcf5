"""llama-server-native utility endpoints: /tokenize /detokenize
/apply-template /slots /infill.

The reference gateway proxies ANY path to llama-server (SURVEY §2.1
"passthrough"), so its clients rely on these non-/v1 endpoints; the backend
must answer them with llama.cpp-shaped JSON.
"""

import dataclasses
import json

import pytest

from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.mock import MockEngine
from llama_gguf_inference_tpu.serving.openai_server import BackendConfig, OpenAIServer
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

from test_serving_stack import http_request


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    p = tmp_path_factory.mktemp("ue") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=96)
    eng = InferenceEngine(str(p), EngineConfig(max_slots=2, ctx=64,
                                               prefill_buckets=(16,),
                                               mode="dense"))
    eng.start()
    yield eng
    eng.stop()


async def _serve(engine):
    srv = OpenAIServer(engine, BackendConfig(host="127.0.0.1", port=0,
                                             api_key=""))
    await srv.start()
    return srv


async def _post(srv, path, payload):
    return await http_request(srv.port, "POST", path,
                              headers={"Content-Type": "application/json"},
                              body=json.dumps(payload).encode())


async def test_tokenize_detokenize_roundtrip(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/tokenize",
                                      {"content": "hello world"})
        assert status == 200
        toks = json.loads(body)["tokens"]
        assert toks and all(isinstance(t, int) for t in toks)

        status, _, body = await _post(srv, "/detokenize", {"tokens": toks})
        assert status == 200
        assert json.loads(body)["content"] == "hello world"
    finally:
        await srv.close()


async def test_tokenize_with_pieces_and_add_special(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(
            srv, "/tokenize", {"content": "hi", "with_pieces": True})
        assert status == 200
        toks = json.loads(body)["tokens"]
        assert all(set(t) == {"id", "piece"} for t in toks)
        assert "".join(t["piece"] for t in toks).lstrip() == "hi"

        # add_special prepends BOS (id from the model's metadata)
        status, _, body = await _post(
            srv, "/tokenize", {"content": "hi", "add_special": True})
        ids = json.loads(body)["tokens"]
        assert ids[0] == engine.tokenizer.special.bos_id
    finally:
        await srv.close()


async def test_detokenize_rejects_bad_ids(engine):
    srv = await _serve(engine)
    try:
        status, _, _ = await _post(srv, "/detokenize",
                                   {"tokens": [0, 10 ** 9]})
        assert status == 400
        status, _, _ = await _post(srv, "/detokenize", {"tokens": ["x"]})
        assert status == 400
        status, _, _ = await _post(srv, "/detokenize", {"nope": 1})
        assert status == 400
    finally:
        await srv.close()


async def test_apply_template_renders_without_generating(engine):
    srv = await _serve(engine)
    try:
        before = engine.stats()["total_generated"]
        status, _, body = await _post(srv, "/apply-template", {
            "messages": [{"role": "system", "content": "be brief"},
                         {"role": "user", "content": "hi"}]})
        assert status == 200
        prompt = json.loads(body)["prompt"]
        assert "be brief" in prompt and "hi" in prompt
        assert engine.stats()["total_generated"] == before
    finally:
        await srv.close()


async def test_slots_reports_scheduler_state(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/v1/completions",
                                      {"prompt": "hello", "max_tokens": 2,
                                       "temperature": 0})
        assert status == 200
        status, _, body = await http_request(srv.port, "GET", "/slots")
        assert status == 200
        slots = json.loads(body)
        assert len(slots) == 2
        assert {s["id"] for s in slots} == {0, 1}
        assert all(s["state"] in (0, 1) for s in slots)
        assert all(s["n_ctx"] == 64 for s in slots)
        # the completed request left its prompt in some slot's prefix cache
        assert any(s["prefix_cached_tokens"] > 0 for s in slots)
    finally:
        await srv.close()


async def test_infill_without_fim_tokens_is_501(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/infill",
                                      {"input_prefix": "def f(", "input_suffix": ")"})
        assert status == 501
        assert json.loads(body)["error"]["code"] == "not_supported"
    finally:
        await srv.close()


async def test_infill_with_fim_tokens_generates(engine, monkeypatch):
    # grant the tiny model FIM ids (stand-ins: existing control tokens) —
    # exercises the PSM prompt construction + generation path
    sp = engine.tokenizer.special
    monkeypatch.setattr(engine.tokenizer, "special", dataclasses.replace(
        sp, fim_pre_id=1, fim_suf_id=2, fim_mid_id=0))
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/infill", {
            "input_prefix": "aa", "input_suffix": "bb",
            "max_tokens": 3, "temperature": 0})
        assert status == 200
        data = json.loads(body)
        assert data["object"] == "text_completion"
        assert data["usage"]["completion_tokens"] >= 1
        # prompt = bos? + fim_pre + enc(aa) + fim_suf + enc(bb) + fim_mid
        assert data["usage"]["prompt_tokens"] >= 5
    finally:
        await srv.close()


async def test_mock_engine_serves_utility_endpoints():
    srv = await _serve(MockEngine())
    try:
        status, _, body = await _post(srv, "/tokenize", {"content": "a b"})
        toks = json.loads(body)["tokens"]
        assert status == 200 and toks and all(isinstance(t, int) for t in toks)
        status, _, body = await http_request(srv.port, "GET", "/slots")
        assert status == 200 and json.loads(body) == []
        status, _, _ = await _post(srv, "/infill", {"input_prefix": "x"})
        assert status == 501
        status, _, body = await _post(srv, "/apply-template",
                                      {"messages": [{"role": "user",
                                                     "content": "yo"}]})
        assert status == 200 and "yo" in json.loads(body)["prompt"]
    finally:
        await srv.close()


def test_fim_ids_parsed_from_gguf_metadata():
    from llama_gguf_inference_tpu.runtime.tokenizer import from_gguf_metadata
    base = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "</s>", "a", "b"],
        "tokenizer.ggml.scores": [0.0] * 5,
        "tokenizer.ggml.token_type": [2, 3, 3, 1, 1],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    tok = from_gguf_metadata(base)
    assert tok.special.fim_pre_id == -1    # absent -> disabled

    modern = dict(base, **{"tokenizer.ggml.fim_pre_token_id": 3,
                           "tokenizer.ggml.fim_suf_token_id": 4,
                           "tokenizer.ggml.fim_mid_token_id": 0})
    tok = from_gguf_metadata(modern)
    assert (tok.special.fim_pre_id, tok.special.fim_suf_id,
            tok.special.fim_mid_id) == (3, 4, 0)

    legacy = dict(base, **{"tokenizer.ggml.prefix_token_id": 4,
                           "tokenizer.ggml.suffix_token_id": 3,
                           "tokenizer.ggml.middle_token_id": 2})
    tok = from_gguf_metadata(legacy)
    assert (tok.special.fim_pre_id, tok.special.fim_suf_id,
            tok.special.fim_mid_id) == (4, 3, 2)


async def test_rerank(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/v1/rerank", {
            "query": "the weather today",
            "documents": ["the weather today", "completely unrelated topic",
                          "weather report"],
            "top_n": 2,
        })
        assert status == 200
        out = json.loads(body)
        assert out["object"] == "list"
        assert len(out["results"]) == 2
        assert all({"index", "relevance_score"} <= set(r)
                   for r in out["results"])
        # identical doc must rank first (cosine == 1.0)
        assert out["results"][0]["index"] == 0
        scores = [r["relevance_score"] for r in out["results"]]
        assert scores == sorted(scores, reverse=True)
        assert out["usage"]["prompt_tokens"] > 0
    finally:
        await srv.close()


async def test_rerank_validation(engine):
    srv = await _serve(engine)
    try:
        status, _, _ = await _post(srv, "/v1/rerank", {"query": "x"})
        assert status == 400
        status, _, _ = await _post(srv, "/v1/rerank",
                                   {"query": "x", "documents": []})
        assert status == 400
    finally:
        await srv.close()


async def test_rerank_501_without_embed(engine):
    class NoEmbed:
        model_name = "stub"
        tokenizer = engine.tokenizer
        metadata = {}
    srv = await _serve(NoEmbed())
    try:
        status, _, body = await _post(srv, "/v1/rerank", {
            "query": "x", "documents": ["a"]})
        assert status == 501
        assert json.loads(body)["error"]["code"] == "not_supported"
    finally:
        await srv.close()


async def test_slot_save_restore_roundtrip(engine, tmp_path, monkeypatch):
    """POST /slots/{id}?action=save|restore|erase (llama-server
    --slot-save-path): a saved prompt cache restores into a FRESH engine
    and re-arms prefix reuse."""
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    monkeypatch.setenv("SLOT_SAVE_PATH", str(tmp_path))
    prompt = list(range(3, 23))
    p = SamplingParams(temperature=0.0, max_tokens=3)
    base = [ev.token_id for ev in engine.generate(prompt, p)]
    # the finished request leaves its prompt cached in some slot
    cached = [i for i, s in enumerate(engine.slots) if s.cached_ids]
    assert cached
    b = cached[0]

    srv = await _serve(engine)
    try:
        status, _, body = await http_request(
            srv.port, "POST", f"/slots/{b}?action=save", body=json.dumps(
                {"filename": "s0.npz"}).encode(),
            headers={"Content-Type": "application/json"})
        assert status == 200, body
        out = json.loads(body)
        assert out["n_saved"] == len(engine.slots[b].cached_ids)
        # erase drops the claim
        status, _, body = await http_request(
            srv.port, "POST", f"/slots/{b}?action=erase")
        assert status == 200 and json.loads(body)["n_erased"] > 0
        assert engine.slots[b].cached_ids == []
        # restore brings it back; a repeat request reuses the prefix
        status, _, body = await http_request(
            srv.port, "POST", f"/slots/{b}?action=restore", body=json.dumps(
                {"filename": "s0.npz"}).encode(),
            headers={"Content-Type": "application/json"})
        assert status == 200, body
        # cached_ids covers prompt + generated[:-1] (the final token's KV
        # is only written by the next dispatch) — restore must match save
        assert json.loads(body)["n_restored"] == out["n_saved"]
        before = engine.total_prefix_reused
        again = [ev.token_id for ev in engine.generate(prompt, p)]
        assert again == base
        assert engine.total_prefix_reused > before, \
            "restored cache must re-arm prompt-prefix reuse"
        # validation: bad action / bad id / traversal-proof filename
        status, _, _ = await http_request(
            srv.port, "POST", f"/slots/{b}?action=zap")
        assert status == 400
        status, _, _ = await http_request(
            srv.port, "POST", "/slots/99?action=erase")
        assert status == 400
        status, _, body = await http_request(
            srv.port, "POST", f"/slots/{b}?action=restore", body=json.dumps(
                {"filename": "../../etc/passwd"}).encode(),
            headers={"Content-Type": "application/json"})
        assert status == 400   # basename-only + no such slot file
    finally:
        await srv.close()


async def test_slot_save_requires_path_env(engine, monkeypatch):
    monkeypatch.delenv("SLOT_SAVE_PATH", raising=False)
    srv = await _serve(engine)
    try:
        status, _, body = await http_request(
            srv.port, "POST", "/slots/0?action=save", body=json.dumps(
                {"filename": "x.npz"}).encode(),
            headers={"Content-Type": "application/json"})
        assert status == 400 and b"SLOT_SAVE_PATH" in body
    finally:
        await srv.close()
