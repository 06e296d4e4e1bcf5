"""Perplexity harness — the Δppl quality gate (SURVEY.md §7 step 10).

Computes token-level perplexity of a GGUF model over a text corpus, chunked
llama.cpp-style (windows of ``ctx`` tokens, loss over the second half of each
window so every scored token has context).  Primary use: Δppl between a
quantized file and its higher-precision source (e.g. Q4_K_M vs F16 of the
same weights) — quantization-induced quality loss, the metric BASELINE.json
gates at ≤ 0.01 between equal-bit-width implementations.

Usage:
    python -m llama_gguf_inference_tpu.tools.perplexity model.gguf corpus.txt
    python -m llama_gguf_inference_tpu.tools.perplexity a.gguf corpus.txt \
        --compare b.gguf --ctx 512
"""

from __future__ import annotations

import argparse
import math
import sys


def model_logprob_sum(path: str, token_ids: list[int], ctx: int,
                      mode: str = "quant") -> tuple[float, int]:
    """Sum of log P(token | prefix) over scored positions; returns (sum, n)."""
    import jax.numpy as jnp
    import numpy as np

    from ..models.llama import KVCache, forward
    from ..runtime.loader import load_model

    cfg, params, reader = load_model(path, mode=mode)
    reader.close()

    total = 0.0
    count = 0
    stride = ctx // 2
    pos = 0
    while pos + 2 <= len(token_ids):
        window = token_ids[pos:pos + ctx]
        T = len(window)
        if T < 2:
            break
        cache = KVCache.zeros(cfg, 1, max(T, 8))
        ids = jnp.asarray(np.asarray(window, np.int32)[None, :])
        logits, _ = forward(params, cfg, ids, jnp.zeros(1, jnp.int32), cache,
                            jnp.full(1, T, jnp.int32))
        import jax
        log_probs = jax.nn.log_softmax(logits[0, :-1], axis=-1)
        lp = np.asarray(jnp.take_along_axis(
            log_probs,
            jnp.asarray(np.asarray(window[1:], np.int32))[:, None], axis=-1))
        # score only the second half (except for the first window)
        start = 0 if pos == 0 else stride - 1
        total += float(lp[start:].sum())
        count += int(lp[start:].shape[0])
        pos += stride
    return total, count


def perplexity(path: str, text: str, ctx: int = 512,
               mode: str = "quant") -> tuple[float, int]:
    from ..gguf.reader import GGUFReader
    from ..runtime.tokenizer import from_gguf_metadata

    r = GGUFReader(path)
    tok = from_gguf_metadata(r.metadata)
    r.close()
    ids = tok.encode(text)
    total, count = model_logprob_sum(path, ids, ctx, mode)
    return math.exp(-total / max(count, 1)), count


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="perplexity")
    p.add_argument("model")
    p.add_argument("corpus", help="path to a plain-text file")
    p.add_argument("--compare", default=None,
                   help="second model; report Δppl (model - compare)")
    p.add_argument("--ctx", type=int, default=512)
    p.add_argument("--mode", default="quant", choices=("quant", "dense"))
    args = p.parse_args(argv)

    text = open(args.corpus, encoding="utf-8", errors="replace").read()
    ppl_a, n = perplexity(args.model, text, args.ctx, args.mode)
    print(f"{args.model}: ppl {ppl_a:.4f} over {n} tokens")
    if args.compare:
        ppl_b, _ = perplexity(args.compare, text, args.ctx, args.mode)
        print(f"{args.compare}: ppl {ppl_b:.4f}")
        print(f"delta_ppl {ppl_a - ppl_b:+.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
