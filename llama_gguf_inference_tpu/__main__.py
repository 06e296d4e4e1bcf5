"""Unified CLI: ``python -m llama_gguf_inference_tpu <command> [args]``.

Commands map to the tool/server modules (each also runnable directly):

    serve        boot the full 3-process stack (launch.start)
    backend      run only the OpenAI backend server
    gateway      run only the gateway
    health       run only the health sidecar
    keys         API key management (generate/list/remove/rotate)
    benchmark    gateway + inference latency/throughput suites
    quantize     requantize a GGUF file
    convert-hf   convert a Hugging Face Llama checkpoint to GGUF
    perplexity   perplexity / delta-ppl harness
    profile      jax.profiler trace capture around decode steps
    kernel-bench dequant-matmul kernel bandwidth microbenchmark
"""

from __future__ import annotations

import sys

_COMMANDS = {
    "serve": ("llama_gguf_inference_tpu.launch.start", "main"),
    "backend": ("llama_gguf_inference_tpu.serving.openai_server", "main"),
    "gateway": ("llama_gguf_inference_tpu.serving.gateway", "main"),
    "health": ("llama_gguf_inference_tpu.serving.health_server", "main"),
    "keys": ("llama_gguf_inference_tpu.serving.key_mgmt", "main"),
    "benchmark": ("llama_gguf_inference_tpu.serving.benchmark", "main"),
    "quantize": ("llama_gguf_inference_tpu.tools.quantize", "main"),
    "convert-hf": ("llama_gguf_inference_tpu.tools.convert_hf", "main"),
    "perplexity": ("llama_gguf_inference_tpu.tools.perplexity", "main"),
    "profile": ("llama_gguf_inference_tpu.tools.profile", "main"),
    "kernel-bench": ("llama_gguf_inference_tpu.tools.kernel_bench", "main"),
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; one of: {', '.join(_COMMANDS)}",
              file=sys.stderr)
        return 2
    module, fn_name = _COMMANDS[cmd]
    import importlib

    fn = getattr(importlib.import_module(module), fn_name)
    rc = fn(argv[1:]) if cmd in ("keys", "benchmark", "quantize", "convert-hf",
                                 "perplexity", "profile", "kernel-bench") \
        else fn()
    return int(rc or 0)


if __name__ == "__main__":
    sys.exit(main())
