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
