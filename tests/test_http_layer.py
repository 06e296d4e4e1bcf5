"""HTTP primitive unit tests (limits, parsing, SSE framing)."""

import asyncio

import pytest

from llama_gguf_inference_tpu.serving.http import (
    HttpLimitError, error_body, read_request, response_bytes, sse_event,
)


class FakeReader:
    def __init__(self, data: bytes):
        self._buf = data

    async def readline(self):
        i = self._buf.find(b"\n")
        if i < 0:
            out, self._buf = self._buf, b""
            return out
        out, self._buf = self._buf[:i + 1], self._buf[i + 1:]
        return out

    async def readexactly(self, n):
        if len(self._buf) < n:
            raise asyncio.IncompleteReadError(self._buf, n)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


async def test_parse_basic_request():
    r = FakeReader(b"POST /v1/x HTTP/1.1\r\nHost: h\r\nX-A: b\r\n"
                   b"Content-Length: 5\r\n\r\nhello")
    req = await read_request(r)
    assert req.method == "POST" and req.path == "/v1/x"
    assert req.headers["x-a"] == "b"
    assert req.body == b"hello"
    assert ("X-A", "b") in req.raw_header_lines


async def test_limits_raise_proper_codes():
    with pytest.raises(HttpLimitError) as e:
        await read_request(FakeReader(b"GET /" + b"a" * 9000 + b" HTTP/1.1\r\n\r\n"))
    assert e.value.status == 414

    hdrs = b"".join(b"X-%d: v\r\n" % i for i in range(100))
    with pytest.raises(HttpLimitError) as e:
        await read_request(FakeReader(b"GET / HTTP/1.1\r\n" + hdrs + b"\r\n"))
    assert e.value.status == 431

    with pytest.raises(HttpLimitError) as e:
        await read_request(FakeReader(b"GET / HTTP/1.1\r\nContent-Length: -5\r\n\r\n"))
    assert e.value.status == 400

    with pytest.raises(HttpLimitError) as e:
        await read_request(FakeReader(
            b"POST / HTTP/1.1\r\nContent-Length: 99999999999\r\n\r\n"))
    assert e.value.status == 413

    with pytest.raises(HttpLimitError) as e:
        await read_request(FakeReader(b"GARBAGE\r\n\r\n"))
    assert e.value.status == 400


async def test_eof_returns_none():
    assert await read_request(FakeReader(b"")) is None


def test_error_body_shapes():
    import json
    e = json.loads(error_body("nope", "invalid_request_error", "invalid_api_key"))
    assert e["error"]["param"] == "authorization"
    e = json.loads(error_body("full", "server_error", "queue_full"))
    assert "param" not in e["error"]


def test_response_bytes_204_has_no_body_headers():
    raw = response_bytes(204)
    assert b"204 No Content" in raw
    assert b"Content-Type" not in raw


def test_sse_event_framing():
    assert sse_event("[DONE]") == b"data: [DONE]\n\n"
    ev = sse_event({"a": 1})
    assert ev.startswith(b"data: {") and ev.endswith(b"\n\n")


def test_ctx_per_slot_semantics():
    """CTX is the TOTAL context budget split across slots (llama.cpp -c /
    --parallel semantics); CTX_PER_SLOT overrides; 256-token floor."""
    from llama_gguf_inference_tpu.serving.openai_server import ctx_per_slot

    assert ctx_per_slot(16384, 4) == 4096
    assert ctx_per_slot(16384, 1) == 16384
    assert ctx_per_slot(2048, 4) == 512
    assert ctx_per_slot(256, 4) == 256          # floor
    assert ctx_per_slot(16384, 4, override=8192) == 8192
    assert ctx_per_slot(0, 0) == 256
