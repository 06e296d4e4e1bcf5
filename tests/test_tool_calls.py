"""OpenAI tool/function calling (``tools``/``tool_choice``) over the chat
endpoint — llama-server supports this natively on the binary the reference
ships (reference ``Dockerfile:11``); here it rides the GBNF grammar
machinery (VERDICT r3 #6)."""

import asyncio
import json
import urllib.request

import pytest

from llama_gguf_inference_tpu.grammar import parse_gbnf
from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
from llama_gguf_inference_tpu.serving.tool_calls import (
    ToolRequestError,
    parse_tool_calls,
    prepare_messages,
    tool_grammar,
    tools_system_prompt,
    validate_tools,
)
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

WEATHER = {"type": "function", "function": {
    "name": "get_weather",
    "description": "Get the weather for a city",
    "parameters": {"type": "object",
                   # maxLength bounds the constrained decode so a
                   # random-weight model can't burn max_tokens inside one
                   # unbounded string (a real model closes the quote itself)
                   "properties": {"city": {"type": "string",
                                           "maxLength": 8}},
                   "required": ["city"], "additionalProperties": False}}}
TIME = {"type": "function", "function": {
    "name": "get_time",
    "parameters": {"type": "object", "properties": {},
                   "additionalProperties": False}}}


# ------------------------------------------------------------------ unit

def test_validate_tools_shapes():
    tools, forced, on = validate_tools({"tools": [WEATHER, TIME]})
    assert [t["name"] for t in tools] == ["get_weather", "get_time"]
    assert forced is None and on
    _, forced, on = validate_tools({"tools": [WEATHER],
                                    "tool_choice": "required"})
    assert forced == "*" and on
    _, forced, on = validate_tools(
        {"tools": [WEATHER], "tool_choice":
         {"type": "function", "function": {"name": "get_weather"}}})
    assert forced == "get_weather" and on
    _, _, on = validate_tools({"tools": [WEATHER], "tool_choice": "none"})
    assert not on
    assert validate_tools({}) == ([], None, False)
    for bad in ({"tools": "x"}, {"tools": [{"type": "function"}]},
                {"tools": [WEATHER], "tool_choice": "sometimes"},
                {"tools": [WEATHER], "tool_choice":
                 {"type": "function", "function": {"name": "nope"}}}):
        with pytest.raises(ToolRequestError):
            validate_tools(bad)


def test_tool_grammar_parses_and_constrains():
    g = tool_grammar([WEATHER["function"], TIME["function"]])
    parse_gbnf(g)                        # valid GBNF
    assert "get_weather" in g and "get_time" in g
    forced = tool_grammar([WEATHER["function"], TIME["function"]],
                          "get_time")
    assert "get_weather" not in forced


def test_parse_tool_calls_shapes():
    tools = [WEATHER["function"], TIME["function"]]
    calls = parse_tool_calls(
        '{"tool_calls": [{"name": "get_weather", '
        '"arguments": {"city": "Oslo"}}]}', tools)
    assert calls and calls[0]["type"] == "function"
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Oslo"}
    assert calls[0]["id"].startswith("call_")
    # fenced JSON tolerated
    assert parse_tool_calls(
        '```json\n{"tool_calls": [{"name": "get_time", "arguments": {}}]}'
        '\n```', tools)
    # free text / bad shapes -> None
    for txt in ("sure, calling now", '{"a": 1}', '{"tool_calls": []}',
                '{"tool_calls": [{"name": "unknown", "arguments": {}}]}',
                '{"tool_calls": "x"}', "{broken"):
        assert parse_tool_calls(txt, tools) is None


def test_prepare_messages_folding():
    msgs = [
        {"role": "user", "content": "weather in Oslo?"},
        {"role": "assistant", "tool_calls": [
            {"id": "call_1", "type": "function",
             "function": {"name": "get_weather",
                          "arguments": '{"city": "Oslo"}'}}]},
        {"role": "tool", "tool_call_id": "call_1", "name": "get_weather",
         "content": '{"temp_c": 4}'},
    ]
    out = prepare_messages(msgs, [WEATHER["function"]], enabled=True)
    assert out[0]["role"] == "system"
    assert "get_weather" in out[0]["content"]
    folded = json.loads(out[2]["content"])
    assert folded["tool_calls"][0]["arguments"] == {"city": "Oslo"}
    assert out[3]["role"] == "tool" and "temp_c" in out[3]["content"]
    # existing system message is extended, not duplicated
    out2 = prepare_messages([{"role": "system", "content": "be brief"}],
                            [WEATHER["function"]], enabled=True)
    assert len(out2) == 1 and out2[0]["content"].startswith("be brief")
    assert tools_system_prompt([WEATHER["function"]]) in out2[0]["content"]


# ------------------------------------------------------- engine + serving

@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    p = tmp_path_factory.mktemp("tools") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    # generous ctx/max_tokens: a RANDOM-weight model keeps appending array
    # items until the grammar's maxItems guard forces "]" — termination is
    # grammar-driven here, not model-driven
    eng = InferenceEngine(str(p), EngineConfig(
        max_slots=2, ctx=2048, prefill_buckets=(32,), mode="dense",
        multi_step=4))
    eng.start()
    yield eng
    eng.stop()


def test_forced_tool_call_grammar_end_to_end(engine):
    """Grammar-forced decode on a RANDOM-weight model must still emit a
    parseable tool call (the whole point of constraining)."""
    g = tool_grammar([WEATHER["function"]], "*")
    text = "".join(ev.text for ev in engine.generate(
        "what's the weather in Oslo?",
        SamplingParams(temperature=0.0, max_tokens=768, grammar=g, seed=5)))
    calls = parse_tool_calls(text, [WEATHER["function"]])
    assert calls and calls[0]["function"]["name"] == "get_weather"
    args = json.loads(calls[0]["function"]["arguments"])
    assert set(args) == {"city"} and isinstance(args["city"], str)


def _drive_server(engine, reqs):
    """Boot an OpenAIServer on an ephemeral port and POST each request."""
    from llama_gguf_inference_tpu.serving.openai_server import (
        BackendConfig, OpenAIServer,
    )

    async def run():
        srv = OpenAIServer(engine, BackendConfig(host="127.0.0.1", port=0))
        await srv.start()
        loop = asyncio.get_running_loop()

        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/chat/completions",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    return r.status, r.read()
            except urllib.error.HTTPError as e:
                return e.code, e.read()

        out = []
        for body in reqs:
            out.append(await loop.run_in_executor(None, post, body))
        await srv.close()
        return out

    return asyncio.run(run())


def test_chat_tool_calls_non_streaming(engine):
    (status, raw), (bad_status, bad_raw) = _drive_server(engine, [
        {"model": "m", "max_tokens": 768, "temperature": 0,
         "messages": [{"role": "user", "content": "weather in Oslo?"}],
         "tools": [WEATHER], "tool_choice": "required"},
        {"model": "m", "max_tokens": 8,
         "messages": [{"role": "user", "content": "hi"}],
         "tools": [WEATHER], "tool_choice": "sometimes"},
    ])
    assert status == 200, raw
    body = json.loads(raw)
    choice = body["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    msg = choice["message"]
    assert msg["content"] is None
    call = msg["tool_calls"][0]
    assert call["type"] == "function"
    assert call["function"]["name"] == "get_weather"
    assert "city" in json.loads(call["function"]["arguments"])
    # malformed tool_choice -> 400 with the OpenAI error envelope
    assert bad_status == 400 and "error" in json.loads(bad_raw)


def test_chat_tool_calls_streaming(engine):
    """Streaming emits OpenAI tool_calls deltas and finish 'tool_calls'."""
    (status, raw), = _drive_server(engine, [
        {"model": "m", "max_tokens": 768, "temperature": 0, "stream": True,
         "messages": [{"role": "user", "content": "weather in Oslo?"}],
         "tools": [WEATHER], "tool_choice": "required"},
    ])
    assert status == 200
    events = [json.loads(line[6:]) for line in raw.decode().split("\n")
              if line.startswith("data: ") and line != "data: [DONE]"]
    deltas = [e["choices"][0]["delta"] for e in events if e["choices"]]
    tc = [d["tool_calls"][0] for d in deltas if "tool_calls" in d]
    assert tc, "no tool_calls deltas streamed"
    assert tc[0]["id"].startswith("call_")
    assert tc[0]["function"]["name"] == "get_weather"
    args = "".join(t["function"].get("arguments", "")
                   for t in tc if "function" in t)
    assert "city" in args
    finishes = [e["choices"][0].get("finish_reason")
                for e in events if e["choices"]]
    assert finishes[-1] == "tool_calls"
    assert raw.decode().rstrip().endswith("data: [DONE]")


def test_chat_plain_text_still_streams_with_tools(engine):
    """tool_choice auto + a non-JSON answer: content must stream through
    (the buffer-then-decide path must not swallow normal replies)."""
    (status, raw), = _drive_server(engine, [
        {"model": "m", "max_tokens": 12, "temperature": 0, "stream": True,
         "messages": [{"role": "user", "content": "say hello"}],
         "tools": [WEATHER], "tool_choice": "auto"},
    ])
    assert status == 200
    text = raw.decode()
    events = [json.loads(line[6:]) for line in text.split("\n")
              if line.startswith("data: ") and line != "data: [DONE]"]
    finishes = [e["choices"][0].get("finish_reason")
                for e in events if e["choices"]]
    assert finishes[-1] in ("stop", "length")
    assert text.rstrip().endswith("data: [DONE]")
