"""Round benchmark: single-chip decode throughput on a 1.1B Q4_K_M model.

Prints ONE JSON line:
    {"metric": "decode_tok_s", "value": N, "unit": "tok/s", "vs_baseline": N}

- model: Llama-3.2-1B-shaped llama (dim 2048, 16 layers, GQA 16/8, head_dim
  128, ffn 8192, vocab 32000) with random weights quantized to Q4_K (+ Q6_K
  output head) — BASELINE.json configs 1-2 shape; the environment has no real
  weights, and throughput is weight-shape-bound, not weight-value-bound.
- measurement: greedy decode steps at batch 1 after prefill, wall-clock over
  ``N_STEPS`` jitted steps (sampling included), compile excluded.
- vs_baseline: ratio to the reference's published pass threshold of 20 tok/s
  (reference docs/LIVE_TESTING_GUIDE.md:279 — its only throughput number).
  Extra context fields: roofline estimate for v5e HBM and % of roofline.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Llama-3.2-1B shape: dim 2048, 16 layers, GQA 32/8, head_dim 128 (MXU/lane
# native), ffn 8192 — the modern small-llama family (BASELINE configs 1-2)
MODEL = dict(dim=2048, n_layers=16, n_heads=16, n_kv_heads=8, ffn_dim=8192)
N_STEPS = 96
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_model_path() -> str:
    import numpy as np

    from llama_gguf_inference_tpu.gguf.constants import GGMLType, Keys
    from llama_gguf_inference_tpu.gguf.writer import GGUFWriter
    from llama_gguf_inference_tpu.utils.testing import make_tiny_vocab

    path = os.environ.get("BENCH_MODEL", "/tmp/bench_llama32_1b_q4k.gguf")
    if os.path.exists(path):
        return path
    log(f"[bench] generating {path} (1.1B Q4_K, one-time)...")
    t0 = time.time()
    rng = np.random.default_rng(0)
    d = MODEL
    head_dim = d["dim"] // d["n_heads"]
    vocab = 32000

    tokens, scores, types = make_tiny_vocab()
    # pad the synthetic vocab to 32000 with filler pieces
    for i in range(len(tokens), vocab):
        tokens.append(f"<extra_{i}>")
        scores.append(-1e6)
        types.append(5)  # UNUSED

    w = GGUFWriter(path)
    w.add(Keys.ARCHITECTURE, "llama")
    w.add(Keys.NAME, "bench-llama3.2-1b-q4km")
    w.add("llama.context_length", 2048)
    w.add("llama.embedding_length", d["dim"])
    w.add("llama.block_count", d["n_layers"])
    w.add("llama.feed_forward_length", d["ffn_dim"])
    w.add("llama.attention.head_count", d["n_heads"])
    w.add("llama.attention.head_count_kv", d["n_kv_heads"])
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.rope.dimension_count", head_dim)
    w.add(Keys.TOKENIZER_MODEL, "llama")
    w.add(Keys.TOKENIZER_TOKENS, tokens)
    w.add(Keys.TOKENIZER_SCORES, np.asarray(scores, np.float32))
    w.add(Keys.TOKENIZER_TOKEN_TYPE, np.asarray(types, np.int32))
    w.add(Keys.TOKENIZER_BOS, 1)
    w.add(Keys.TOKENIZER_EOS, 2)
    w.add(Keys.TOKENIZER_UNK, 0)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(vocab, d["dim"]), GGMLType.Q4_K)
    for i in range(d["n_layers"]):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(d["dim"], np.float32), GGMLType.F32)
        w.add_tensor(p + "attn_q.weight", rand(d["dim"], d["dim"]), GGMLType.Q4_K)
        w.add_tensor(p + "attn_k.weight",
                     rand(d["n_kv_heads"] * head_dim, d["dim"]), GGMLType.Q4_K)
        w.add_tensor(p + "attn_v.weight",
                     rand(d["n_kv_heads"] * head_dim, d["dim"]), GGMLType.Q4_K)
        w.add_tensor(p + "attn_output.weight", rand(d["dim"], d["dim"]), GGMLType.Q4_K)
        w.add_tensor(p + "ffn_norm.weight", np.ones(d["dim"], np.float32), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", rand(d["ffn_dim"], d["dim"]), GGMLType.Q4_K)
        w.add_tensor(p + "ffn_up.weight", rand(d["ffn_dim"], d["dim"]), GGMLType.Q4_K)
        w.add_tensor(p + "ffn_down.weight", rand(d["dim"], d["ffn_dim"]), GGMLType.Q4_K)
    w.add_tensor("output_norm.weight", np.ones(d["dim"], np.float32), GGMLType.F32)
    w.add_tensor("output.weight", rand(vocab, d["dim"]), GGMLType.Q6_K)
    w.write()
    log(f"[bench] model written in {time.time() - t0:.1f}s "
        f"({os.path.getsize(path) / 1e9:.2f} GB)")
    return path


def main() -> None:
    path = bench_model_path()

    import jax

    try:  # persistent compile cache cuts warm-start dramatically
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    dev = jax.devices()[0]
    log(f"[bench] device: {dev} ({dev.platform})")

    # BENCH_SLOTS>1 measures aggregate continuous-batching throughput
    n_slots = int(os.environ.get("BENCH_SLOTS", 1))

    t0 = time.time()
    eng = InferenceEngine(path, EngineConfig(
        max_slots=n_slots, ctx=512, prefill_buckets=(128,), mode="quant",
        multi_step=int(os.environ.get("BENCH_MULTI_STEP", 16))))
    eng.start()
    load_s = time.time() - t0
    log(f"[bench] load+repack: {load_s:.1f}s")

    leaves = jax.tree_util.tree_leaves(eng.params)
    weight_bytes = sum(l.nbytes for l in leaves if hasattr(l, "nbytes"))
    log(f"[bench] resident weight bytes: {weight_bytes / 1e9:.3f} GB")

    prompt = list(range(3, 3 + 100))
    p = SamplingParams(temperature=0.0, max_tokens=N_STEPS + 1)

    # warmup: compiles prefill + multi-step decode graphs
    t0 = time.time()
    for _ in eng.generate(prompt, SamplingParams(temperature=0.0, max_tokens=18)):
        pass
    log(f"[bench] warmup (compiles): {time.time() - t0:.1f}s")

    # timed run: decode throughput from first to last streamed token
    eng._last_decode_s = 0.0   # reset EWMA (warmup seeded it with compile time)
    if n_slots == 1:
        times = []
        for ev in eng.generate(prompt, p):
            times.append(time.time())
        n_tok = len(times)
        decode_s = times[-1] - times[0]
        tok_s = (n_tok - 1) / decode_s if decode_s > 0 else 0.0
    else:
        # aggregate across n_slots concurrent requests
        import threading
        times = []
        lock = threading.Lock()

        def one():
            for ev in eng.generate(prompt, p):
                with lock:
                    times.append(time.time())

        threads = [threading.Thread(target=one) for _ in range(n_slots)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        times.sort()
        n_tok = len(times)
        # steady-state window: middle 50% of token arrivals (excludes the
        # staggered per-slot prefill ramp and the drain tail)
        lo, hi = n_tok // 4, 3 * n_tok // 4
        decode_s = times[hi] - times[lo]
        tok_s = (hi - lo) / decode_s if decode_s > 0 else 0.0
    step_ms = eng._last_decode_s * 1000
    eng.stop()

    roofline = V5E_HBM_GBS * 1e9 / weight_bytes if dev.platform == "tpu" else None
    result = {
        "metric": "decode_tok_s",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / 20.0, 3),
        "model": "llama32-1b-q4km-shape",
        "batch": n_slots,
        "device": str(dev),
        "decode_step_ms": round(step_ms, 2),
        "weight_gb": round(weight_bytes / 1e9, 3),
        "load_s": round(load_s, 1),
    }
    if roofline:
        result["roofline_tok_s"] = round(roofline, 1)
        result["pct_roofline"] = round(100 * tok_s / roofline, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
