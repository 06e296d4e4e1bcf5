"""Engine-failure surfacing through the backend API (VERDICT r1 weak #7).

A dead engine must yield 5xx (non-stream / pre-stream) or a terminal SSE
error event (mid-stream) — never a 200 with finish_reason "stop" and an
empty body.  Reference clients see 502/504 in the analogous states
(reference gateway.py:842-904).
"""

import json

from llama_gguf_inference_tpu.runtime.mock import MockEngine
from llama_gguf_inference_tpu.serving.openai_server import (
    BackendConfig,
    OpenAIServer,
)

from test_serving_stack import http_request


async def make_backend(fail_after: int):
    backend = OpenAIServer(MockEngine(fail_after=fail_after),
                           BackendConfig(host="127.0.0.1", port=0))
    await backend.start()
    return backend


async def test_nonstream_engine_error_is_500():
    backend = await make_backend(fail_after=0)
    try:
        req = json.dumps({"messages": [{"role": "user", "content": "hi"}],
                          "max_tokens": 4}).encode()
        status, _, body = await http_request(
            backend.port, "POST", "/v1/chat/completions",
            headers={"Content-Type": "application/json"}, body=req)
        assert status == 500
        err = json.loads(body)["error"]
        assert err["code"] == "engine_error"
        assert err["type"] == "server_error"
    finally:
        await backend.close()


async def test_nonstream_partial_then_error_is_500():
    backend = await make_backend(fail_after=3)
    try:
        req = json.dumps({"prompt": "hi", "max_tokens": 8}).encode()
        status, _, body = await http_request(
            backend.port, "POST", "/v1/completions",
            headers={"Content-Type": "application/json"}, body=req)
        assert status == 500
        assert json.loads(body)["error"]["code"] == "engine_error"
    finally:
        await backend.close()


async def test_stream_error_before_first_byte_is_500():
    backend = await make_backend(fail_after=0)
    try:
        req = json.dumps({"messages": [{"role": "user", "content": "hi"}],
                          "stream": True}).encode()
        status, hdrs, body = await http_request(
            backend.port, "POST", "/v1/chat/completions",
            headers={"Content-Type": "application/json"}, body=req)
        assert status == 500
        assert "text/event-stream" not in hdrs.get("content-type", "")
    finally:
        await backend.close()


async def test_stream_midstream_error_emits_sse_error_no_done():
    backend = await make_backend(fail_after=2)
    try:
        req = json.dumps({"messages": [{"role": "user", "content": "hi"}],
                          "stream": True, "max_tokens": 8}).encode()
        status, hdrs, body = await http_request(
            backend.port, "POST", "/v1/chat/completions",
            headers={"Content-Type": "application/json"}, body=req)
        assert status == 200  # headers were already committed mid-stream
        text = body.decode()
        events = [line[6:] for line in text.splitlines()
                  if line.startswith("data: ")]
        assert "[DONE]" not in events
        last = json.loads(events[-1])
        assert last["error"]["code"] == "engine_error"
        # the successfully generated tokens were streamed before the error
        assert any("mock-token-1" in e for e in events[:-1])
    finally:
        await backend.close()


async def test_stream_success_still_ends_with_done():
    backend = await make_backend(fail_after=-1)
    try:
        req = json.dumps({"messages": [{"role": "user", "content": "hi"}],
                          "stream": True, "max_tokens": 3}).encode()
        status, _, body = await http_request(
            backend.port, "POST", "/v1/chat/completions",
            headers={"Content-Type": "application/json"}, body=req)
        assert status == 200
        events = [line[6:] for line in body.decode().splitlines()
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        first = json.loads(events[0])
        assert first["choices"][0]["delta"].get("role") == "assistant"
    finally:
        await backend.close()
