"""Grammar-constrained decoding: GBNF parsing, JSON-Schema conversion,
matcher semantics, engine integration, and the OpenAI serving surface
(``response_format`` / ``grammar`` / ``json_schema`` — llama-server
fields reachable through the reference's verbatim proxy,
reference ``scripts/gateway.py:807``).
"""

import json

import numpy as np
import pytest

from llama_gguf_inference_tpu.grammar import (
    JSON_GBNF, GrammarMatcher, TokenTrie, json_schema_to_gbnf, parse_gbnf,
)
from llama_gguf_inference_tpu.grammar.gbnf import GBNFError
from llama_gguf_inference_tpu.grammar.json_schema import SchemaError
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


# ---------------------------------------------------------------- GBNF parse
def test_parse_basic():
    g = parse_gbnf('root ::= "a" | "b" root')
    assert len(g.rules) >= 1
    assert g.root == 0


@pytest.mark.parametrize("bad", [
    "",                      # no root
    "nonsense",              # name w/o ::= (regression: EOF spin)
    'root ::= "unterminated',
    "root ::= [a-",
    "other ::= \"x\"",       # root missing
    'root ::= undefined_rule',
])
def test_parse_rejects(bad):
    with pytest.raises(GBNFError):
        parse_gbnf(bad)


def _accepts(g, text: str) -> bool:
    class _T:
        vocab_size, eog_ids = 0, set()

        def piece_bytes(self, i):  # pragma: no cover
            return b""
    m = GrammarMatcher(g, TokenTrie(_T()))
    st = m._accepts(m.state, text)
    return any(not s for s in st)


@pytest.mark.parametrize("gbnf,ok,bad", [
    ('root ::= "ab"', ["ab"], ["a", "abc", ""]),
    ('root ::= [0-9]+', ["1", "123"], ["", "a", "12a"]),
    ('root ::= "a"? "b"', ["b", "ab"], ["a", "aab"]),
    ('root ::= "x"{2,3}', ["xx", "xxx"], ["x", "xxxx"]),
    ('root ::= ("a" | "bc")*', ["", "a", "bca", "aabc"], ["b"]),
    ('root ::= [^xyz]', ["a", "0"], ["x", "z", "aa"]),
    ('root ::= "\\"" [a-z]* "\\""', ['"abc"', '""'], ['"abc', "abc"]),
])
def test_matcher_language(gbnf, ok, bad):
    g = parse_gbnf(gbnf)
    for s in ok:
        assert _accepts(g, s), (gbnf, s)
    for s in bad:
        assert not _accepts(g, s), (gbnf, s)


def test_recursive_grammar():
    g = parse_gbnf('root ::= "(" root ")" | ""')
    assert _accepts(g, "((()))")
    assert not _accepts(g, "(()")


# ------------------------------------------------------------- schema -> GBNF
def _valid_under(schema, text: str) -> bool:
    return _accepts(parse_gbnf(json_schema_to_gbnf(schema)), text)


def test_schema_object_required_optional():
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"},
                             "b": {"type": "string"}},
              "required": ["a"]}
    assert _valid_under(schema, '{"a": 1}')
    assert _valid_under(schema, '{"a": -12, "b": "x"}')
    assert not _valid_under(schema, '{"b": "x"}')          # missing required
    assert not _valid_under(schema, '{"a": "str"}')        # wrong type
    assert not _valid_under(schema, '{"a": 1, "c": 2}')    # undeclared prop


def test_schema_additional_properties():
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "additionalProperties": True}
    assert _valid_under(schema, '{"a": 1, "zzz": "free"}')
    assert _valid_under(schema, '{}')


def test_schema_array_bounds():
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 3}
    assert _valid_under(schema, "[1]")
    assert _valid_under(schema, "[1, 2, 3]")
    assert not _valid_under(schema, "[]")
    assert not _valid_under(schema, "[1, 2, 3, 4]")
    assert not _valid_under(schema, '["s"]')


def test_schema_enum_const_anyof():
    assert _valid_under({"enum": ["a", 1, None]}, '"a"')
    assert _valid_under({"enum": ["a", 1, None]}, "1")
    assert _valid_under({"enum": ["a", 1, None]}, "null")
    assert not _valid_under({"enum": ["a", 1]}, '"b"')
    assert _valid_under({"const": {"k": [1]}}, '{"k": [1]}')
    assert _valid_under({"anyOf": [{"type": "integer"}, {"type": "null"}]},
                        "null")


def test_schema_ref_recursion():
    schema = {"$defs": {"node": {"type": "object",
                                 "properties": {
                                     "next": {"anyOf": [
                                         {"$ref": "#/$defs/node"},
                                         {"type": "null"}]}},
                                 "required": ["next"]}},
              "$ref": "#/$defs/node"}
    assert _valid_under(schema, '{"next": {"next": null}}')
    assert not _valid_under(schema, '{"next": 5}')


def test_schema_string_length():
    schema = {"type": "string", "minLength": 2, "maxLength": 3}
    assert _valid_under(schema, '"ab"')
    assert _valid_under(schema, '"abc"')
    assert not _valid_under(schema, '"a"')
    assert not _valid_under(schema, '"abcd"')


def test_schema_rejects_unsupported():
    with pytest.raises(SchemaError):
        json_schema_to_gbnf(False)
    with pytest.raises(SchemaError):
        json_schema_to_gbnf({"allOf": [{"type": "integer"},
                                       {"type": "string"}]})
    with pytest.raises(SchemaError):
        json_schema_to_gbnf({"$ref": "http://external"})


def test_json_gbnf_accepts_json():
    g = parse_gbnf(JSON_GBNF)
    assert _accepts(g, '{"a": [1, 2.5, true, null, "s"], "b": {"c": {}}}')
    assert not _accepts(g, '[1]')       # llama-server: top level is an object
    assert not _accepts(g, '{"a": }')


# ------------------------------------------------------------------- engine
@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    p = tmp_path_factory.mktemp("gram") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    eng = InferenceEngine(str(p), EngineConfig(
        max_slots=2, ctx=256, prefill_buckets=(32,), mode="dense",
        multi_step=4))
    eng.start()
    yield eng
    eng.stop()


SCHEMA = {"type": "object",
          "properties": {"a": {"type": "integer"},
                         "b": {"enum": ["x", "y"]}},
          "required": ["a", "b"]}


@pytest.mark.parametrize("temperature", [0.0, 1.0])
def test_engine_constrained_output_is_schema_valid(engine, temperature):
    gb = json_schema_to_gbnf(SCHEMA)
    text = "".join(ev.text for ev in engine.generate(
        "hello", SamplingParams(temperature=temperature, max_tokens=64,
                                grammar=gb, seed=7)))
    val = json.loads(text)   # random-weight model, yet valid JSON
    assert set(val) == {"a", "b"}
    assert isinstance(val["a"], int) and val["b"] in ("x", "y")


def test_engine_json_object_mode(engine):
    text = "".join(ev.text for ev in engine.generate(
        "hi", SamplingParams(temperature=0.9, max_tokens=96,
                             grammar=JSON_GBNF, seed=3)))
    assert isinstance(json.loads(text), dict)


def test_engine_bad_grammar_fails_request_only(engine):
    evs = list(engine.generate("x", SamplingParams(max_tokens=4,
                                                   grammar="nonsense")))
    assert evs[-1].finish_reason == "error"
    assert "invalid grammar" in evs[-1].text
    # engine still serves unconstrained requests afterwards
    toks = [ev.token_id for ev in engine.generate(
        "hello", SamplingParams(temperature=0.0, max_tokens=3))]
    assert len(toks) == 3


def test_engine_unconstrained_parity_after_grammar(engine):
    """A grammar request must not perturb later unconstrained greedy output
    (bias rows are per-slot and rewritten at admission)."""
    p = SamplingParams(temperature=0.0, max_tokens=6)
    before = [ev.token_id for ev in engine.generate("same prompt", p)]
    gb = json_schema_to_gbnf(SCHEMA)
    list(engine.generate("hello", SamplingParams(
        temperature=0.0, max_tokens=16, grammar=gb)))
    after = [ev.token_id for ev in engine.generate("same prompt", p)]
    assert before == after


def test_engine_logit_bias_applies(engine):
    toks = [ev.token_id for ev in engine.generate(
        "hello", SamplingParams(temperature=0.0, max_tokens=3,
                                logit_bias={55: 1e4}))]
    assert toks[0] == 55


def test_engine_logit_bias_ban(engine):
    free = [ev.token_id for ev in engine.generate(
        "hello", SamplingParams(temperature=0.0, max_tokens=1))]
    banned = [ev.token_id for ev in engine.generate(
        "hello", SamplingParams(temperature=0.0, max_tokens=1,
                                logit_bias={free[0]: -1e9}))]
    assert banned[0] != free[0]


# ------------------------------------------------------------------- server
async def _post(srv, path, payload):
    from test_serving_stack import http_request
    return await http_request(srv.port, "POST", path,
                              headers={"Content-Type": "application/json"},
                              body=json.dumps(payload).encode())


async def _serve(engine):
    from llama_gguf_inference_tpu.serving.openai_server import (
        BackendConfig, OpenAIServer,
    )
    srv = OpenAIServer(engine, BackendConfig(host="127.0.0.1", port=0,
                                             api_key=""))
    await srv.start()
    return srv


async def test_server_response_format_json_schema(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/v1/chat/completions", {
            "model": "m", "max_tokens": 64, "temperature": 0,
            "messages": [{"role": "user", "content": "give me json"}],
            "response_format": {"type": "json_schema",
                                "json_schema": {"name": "t",
                                                "schema": SCHEMA}},
        })
        assert status == 200
        content = json.loads(body)["choices"][0]["message"]["content"]
        val = json.loads(content)
        assert set(val) == {"a", "b"}
    finally:
        await srv.close()


async def test_server_response_format_json_object_streaming(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/v1/chat/completions", {
            "model": "m", "max_tokens": 64, "temperature": 0, "stream": True,
            "messages": [{"role": "user", "content": "json please"}],
            "response_format": {"type": "json_object"},
        })
        assert status == 200
        text = ""
        for line in body.decode().splitlines():
            if line.startswith("data: ") and line != "data: [DONE]":
                delta = json.loads(line[6:])["choices"][0]["delta"]
                text += delta.get("content", "")
        assert isinstance(json.loads(text), dict)
    finally:
        await srv.close()


async def test_server_raw_grammar_field(engine):
    srv = await _serve(engine)
    try:
        status, _, body = await _post(srv, "/v1/completions", {
            "model": "m", "max_tokens": 8, "temperature": 0,
            "prompt": "count: ",
            "grammar": 'root ::= [0-9]+',
        })
        assert status == 200
        text = json.loads(body)["choices"][0]["text"]
        assert text and all(c.isdigit() for c in text)
    finally:
        await srv.close()


async def test_server_bad_schema_400(engine):
    srv = await _serve(engine)
    try:
        for payload in (
            {"response_format": {"type": "json_schema"}},
            {"response_format": {"type": "wat"}},
            {"grammar": "root ::= [broken"},
            {"logit_bias": "nope"},
        ):
            status, _, body = await _post(srv, "/v1/chat/completions", {
                "model": "m", "max_tokens": 4,
                "messages": [{"role": "user", "content": "x"}], **payload})
            assert status == 400, (payload, body)
            assert json.loads(body)["error"]["type"] == "invalid_request_error"
    finally:
        await srv.close()


def test_bias_row_unconstrained_free_slots():
    """SampleState.bias defaults to zeros — free slots in the decode batch
    sample unbiased garbage, never NaN."""
    from llama_gguf_inference_tpu.runtime.sampler import SampleState, sample
    import jax.numpy as jnp
    st = SampleState.init(2, 16)
    logits = jnp.zeros((2, 16), jnp.float32)
    tok, _ = sample(logits, st)
    assert np.asarray(tok).shape == (2,)
