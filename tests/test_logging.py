"""Structured logging contract: LOG_FORMAT text | json (reference §5.5)."""

import json

from llama_gguf_inference_tpu.utils import logging as slog


def test_json_format(monkeypatch, capsys):
    monkeypatch.setenv("LOG_FORMAT", "json")
    slog.info("request", component="gateway", status=200, duration_ms=1.5)
    line = capsys.readouterr().err.strip()
    rec = json.loads(line)
    assert rec["level"] == "info"
    assert rec["component"] == "gateway"
    assert rec["msg"] == "request"
    assert rec["status"] == 200
    assert rec["duration_ms"] == 1.5
    assert rec["ts"].endswith("Z")


def test_text_format(monkeypatch, capsys):
    monkeypatch.setenv("LOG_FORMAT", "text")
    slog.warning("backend slow", component="gateway", duration_ms=12)
    line = capsys.readouterr().err.strip()
    assert "WARN" in line and "[gateway]" in line
    assert "backend slow" in line and "duration_ms=12" in line


async def test_gateway_logs_duration(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("LOG_FORMAT", "json")
    from test_serving_stack import make_stack, http_request, AUTH
    backend, gw = await make_stack(tmp_path)
    try:
        await http_request(gw.port, "GET", "/v1/models", headers=AUTH)
    finally:
        await gw.close(); await backend.close()
    lines = [l for l in capsys.readouterr().err.splitlines() if l.startswith("{")]
    recs = [json.loads(l) for l in lines]
    req_logs = [r for r in recs if r.get("msg") == "request"]
    assert req_logs and req_logs[0]["status"] == 200
    assert req_logs[0]["duration_ms"] >= 0
    assert req_logs[0]["path"] == "/v1/models"
