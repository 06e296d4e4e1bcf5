"""Benchmark CLI tests against the live mock stack (contract: SURVEY §2.6)."""

import json

import pytest

from llama_gguf_inference_tpu.serving.benchmark import (
    async_main, build_parser, compute_stats, parse_sse_tokens, percentile,
)
from test_serving_stack import make_stack, VALID_KEY


def test_percentile_nearest_rank():
    vals = [float(i) for i in range(1, 101)]
    assert percentile(vals, 50) == 50.0
    assert percentile(vals, 95) == 95.0
    assert percentile(vals, 99) == 99.0
    assert percentile([5.0], 99) == 5.0
    assert percentile([], 50) == 0.0


def test_compute_stats():
    s = compute_stats([1.0, 2.0, 3.0, 4.0])
    assert s["count"] == 4
    assert s["mean"] == 2.5
    assert s["min"] == 1.0 and s["max"] == 4.0
    assert compute_stats([])["count"] == 0


def test_parse_sse_tokens():
    buf = ('data: {"choices":[{"delta":{"role":"assistant"}}]}\n'
           'data: {"choices":[{"delta":{"content":"Hel"}}]}\n'
           'data: {"choices":[{"delta":{"content":"lo"}}]}\n'
           'data: [DONE]\n'
           'data: {"choices":[{"delta":{"content":"par')
    tokens, rest = parse_sse_tokens(buf)
    assert tokens == ["Hel", "lo"]
    assert rest.startswith('data: {"choices"')
    # junk lines ignored
    tokens, _ = parse_sse_tokens("not-sse\ndata: {bad json}\n")
    assert tokens == []


async def test_benchmark_against_mock_stack(tmp_path):
    backend, gw = await make_stack(tmp_path)
    try:
        args = build_parser().parse_args([
            "--url", f"http://127.0.0.1:{gw.port}", "--api-key", VALID_KEY,
            "--suite", "all", "--requests", "3", "--concurrency", "2",
            "--max-tokens", "4",
        ])
        report = await async_main(args)
        assert report["gateway"]["ping"]["errors"] == 0
        assert report["gateway"]["ping"]["latency_ms"]["count"] == 3
        inf = report["inference"]
        assert inf["errors"] == 0
        assert inf["ttft_ms"]["count"] == 3
        assert inf["tokens_per_second"]["mean"] > 0
    finally:
        await gw.close(); await backend.close()


# ---- unit depth: percentile / stats / SSE parse / Target / formatting ------

from llama_gguf_inference_tpu.serving.benchmark import Target, format_text


class TestPercentileDepth:
    def test_empty(self):
        assert percentile([], 50) == 0.0

    def test_single(self):
        assert percentile([7.0], 50) == 7.0
        assert percentile([7.0], 99) == 7.0

    def test_nearest_rank_definition(self):
        vals = list(map(float, range(1, 101)))          # 1..100
        assert percentile(vals, 50) == 50.0             # ceil(.5*100)=50
        assert percentile(vals, 95) == 95.0
        assert percentile(vals, 99) == 99.0
        assert percentile(vals, 100) == 100.0

    def test_unsorted_input(self):
        assert percentile([3.0, 1.0, 2.0], 50) == 2.0

    def test_small_n_p99_is_max(self):
        assert percentile([5.0, 9.0, 1.0], 99) == 9.0

    def test_rank_never_exceeds_n(self):
        assert percentile([1.0, 2.0], 150) == 2.0       # clamped


class TestComputeStatsDepth:
    def test_empty_all_zero(self):
        s = compute_stats([])
        assert s == {"count": 0, "mean": 0.0, "min": 0.0, "max": 0.0,
                     "p50": 0.0, "p95": 0.0, "p99": 0.0}

    def test_fields(self):
        s = compute_stats([2.0, 4.0, 6.0])
        assert s["count"] == 3 and s["mean"] == 4.0
        assert s["min"] == 2.0 and s["max"] == 6.0 and s["p50"] == 4.0


def _chunk(content=None, finish=None, obj=None):
    if obj is None:
        obj = {"choices": [{"delta": ({"content": content} if content is not None else {}),
                            "finish_reason": finish}]}
    return "data: " + json.dumps(obj) + "\n"


class TestParseSSEDepth:
    def test_partial_line_buffered(self):
        full = _chunk("Hello")
        toks, rem = parse_sse_tokens(full[:15])
        assert toks == [] and rem == full[:15]
        toks, rem = parse_sse_tokens(rem + full[15:])
        assert toks == ["Hello"] and rem == ""

    def test_done_marker_ignored(self):
        toks, rem = parse_sse_tokens(_chunk("x") + "data: [DONE]\n")
        assert toks == ["x"] and rem == ""

    def test_non_data_lines_skipped(self):
        buf = ": comment\nevent: ping\n" + _chunk("y")
        assert parse_sse_tokens(buf)[0] == ["y"]

    def test_malformed_json_skipped(self):
        buf = "data: {not json}\n" + _chunk("z")
        assert parse_sse_tokens(buf)[0] == ["z"]

    def test_empty_choices_and_delta(self):
        buf = _chunk(obj={"choices": []}) + _chunk(finish="stop") + _chunk("ok")
        assert parse_sse_tokens(buf)[0] == ["ok"]

    def test_crlf_lines(self):
        toks, rem = parse_sse_tokens(_chunk("a").replace("\n", "\r\n"))
        assert toks == ["a"] and rem == ""

    def test_multiple_tokens_one_read(self):
        buf = _chunk("a") + _chunk("b") + _chunk("c")
        assert parse_sse_tokens(buf)[0] == ["a", "b", "c"]


class TestTargetDepth:
    def test_url_parsing(self):
        t = Target("http://example.com:8123", "k")
        assert (t.host, t.port) == ("example.com", 8123)

    def test_default_ports(self):
        assert Target("http://h", None).port == 80
        assert Target("https://h", None).port == 443

    def test_auth_header_only_with_key(self):
        assert "Authorization" not in Target("http://h", None).headers()
        assert "Authorization: Bearer k\r\n" in Target("http://h", "k").headers()

    def test_connection_close_forced(self):
        assert "Connection: close" in Target("http://h", None).headers()


class TestFormatAndParser:
    def test_format_text_gateway(self):
        rep = {"gateway": {"ping": {"errors": 0, "latency_ms": compute_stats([1.0])},
                           "health": {"errors": 2, "latency_ms": compute_stats([3.0])}}}
        out = format_text(rep)
        assert "/ping" in out and "errors 2" in out

    def test_format_text_inference(self):
        rep = {"inference": {"requests": 4, "concurrency": 2, "errors": 1,
                             "ttft_ms": compute_stats([10.0]),
                             "total_latency_ms": compute_stats([20.0]),
                             "tokens_per_second": compute_stats([30.0])}}
        out = format_text(rep)
        assert "n=4, c=2" in out and "mean 30.00" in out

    def test_parser_defaults(self):
        a = build_parser().parse_args([])
        assert (a.url, a.suite, a.requests, a.concurrency) == \
            ("http://localhost:8000", "all", 10, 1)
        assert not a.json_out

    def test_parser_rejects_bad_suite(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["--suite", "nope"])

    def test_parser_json_flag(self):
        assert build_parser().parse_args(["--json"]).json_out
