"""llama_gguf_inference_tpu — a TPU-native GGUF inference framework.

A from-scratch rebuild (JAX/XLA/Pallas/pjit) of the capabilities of
``zepfu/llama-gguf-inference``: an OpenAI-compatible serving stack around a GGUF
inference engine.  Where the reference delegates all inference to llama.cpp's
``llama-server`` C++ binary (reference ``Dockerfile:11``, ``start.sh:473-522``),
this package implements the engine natively for TPU:

- ``gguf``     — spec-compliant GGUF reader/writer (mmap, metadata, tensor infos)
- ``quant``    — per-format block codecs (numpy golden reference + packers)
- ``ops``      — Pallas TPU kernels: fused dequant+matmul, flash attention
- ``models``   — Llama / Mixtral forward graphs in JAX
- ``parallel`` — jax.sharding Mesh + partition rules (TP/EP over quantized blocks)
- ``runtime``  — engine, continuous-batching scheduler, paged KV, sampling, tokenizer
- ``serving``  — gateway / auth / health / key_mgmt / benchmark (reference L2-L5 contract)
- ``utils``    — config-from-env, logging, metrics helpers
"""

__version__ = "0.1.0"
