"""Decompose decode-step time into components by marginal scan timing.

The e2e 8B bench shows ~26 ms/token where the matmul kernels alone account
for ~11 ms — this tool attributes the remainder.  Same methodology as
tools/kernel_bench (the only reliable one through the remote relay): each
component is timed as the SLOPE between scan chains of N and 5N iterations
with a forced scalar fetch, so fixed dispatch/fetch cost cancels.

Components:
    full      — the engine's real multi-step body (forward + sample + lp)
    forward   — model forward only (argmax token feedback, cache in-place)
    nohead    — forward body with the LM-head output unused (hidden feedback)
    head      — LM-head matmul alone on a fixed hidden state
    matmuls   — every layer's linear projections alone (no attention/norms)
    sample    — sampler + log_softmax on a fixed logits row

attention+norms+rope+kv ≈ nohead - matmuls;  head ≈ forward - nohead.

Usage:
    python -m llama_gguf_inference_tpu.tools.decode_decompose \
        --model /tmp/bench_llama3_8b_q4k.gguf [--ctx 1024] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _slope(chains: dict, short: int, long_: int, reps: int = 5) -> float:
    """Median seconds-per-iteration; chains maps n -> zero-arg callable."""
    import numpy as np

    for n in (short, long_):
        float(np.asarray(chains[n]()))     # compile + warm, forced fetch

    def timed(n):
        t0 = time.perf_counter()
        float(np.asarray(chains[n]()))
        return time.perf_counter() - t0

    slopes = []
    for _ in range(reps):
        slopes.append((timed(long_) - timed(short)) / (long_ - short))
    return float(np.median(slopes))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", required=True)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--mode", default="quant", choices=("quant", "dense"))
    ap.add_argument("--kv", default="bf16", choices=("bf16", "q8_0"),
                    help="KV cache type (A/B the q8_0 traffic halving)")
    ap.add_argument("--only", default="",
                    help="comma-separated component subset")
    args = ap.parse_args(argv)

    from ..utils.platform import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from ..models.llama import KVCache, forward
    from ..ops.linear import matmul
    from ..runtime.loader import load_model
    from ..runtime.sampler import SampleState, SamplingParams, sample

    log(f"[decompose] device: {jax.devices()[0]}")
    t0 = time.time()
    cfg, params, meta = load_model(args.model, mode=args.mode)
    log(f"[decompose] loaded in {time.time() - t0:.1f}s")

    B, S = 1, args.ctx
    if args.kv == "q8_0":
        from ..runtime.kv_cache import QuantKV
        cache = QuantKV.zeros(cfg, B, S)
    else:
        cache = KVCache.zeros(cfg, B, S)
    st = SampleState.init(B, cfg.vocab_size)
    st = st.write_slot(0, SamplingParams(temperature=0.0, max_tokens=64))
    tok0 = jnp.full((B, 1), 3, jnp.int32)
    off0 = jnp.full(B, S // 2, jnp.int32)       # mid-context: realistic mask
    ones = jnp.ones(B, jnp.int32)
    hidden0 = jnp.zeros((B, 1, cfg.dim), jnp.bfloat16) + 0.01
    logits0 = jnp.zeros((B, cfg.vocab_size), jnp.float32) + 0.1

    def make_full(n):
        # mirrors the engine's DEFAULT multi-step body (forward + sample;
        # log-softmax lives only in the _lp graph variants since r5)
        @jax.jit
        def run(params, cache, st):
            def body(c, _):
                cache, tok, off, st = c
                logits, cache = forward(params, cfg, tok, off, cache, ones)
                nxt, st = sample(logits[:, 0, :], st)
                return (cache, nxt[:, None], off + 1, st), nxt[0]
            (_, tok, _, _), toks = jax.lax.scan(
                body, (cache, tok0, off0, st), None, length=n)
            return toks[-1] + tok[0, 0]
        return lambda: run(params, cache, st)

    def make_full_lp(n):
        # the logprobs-requested body (what "full" measured before r5)
        @jax.jit
        def run(params, cache, st):
            def body(c, _):
                cache, tok, off, st = c
                logits, cache = forward(params, cfg, tok, off, cache, ones)
                last = logits[:, 0, :]
                nxt, st = sample(last, st)
                lp = jax.nn.log_softmax(last, axis=-1)
                tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
                return (cache, nxt[:, None], off + 1, st), tok_lp[0]
            (_, tok, _, _), lps = jax.lax.scan(
                body, (cache, tok0, off0, st), None, length=n)
            return lps[-1] + tok[0, 0].astype(jnp.float32) * 1e-30
        return lambda: run(params, cache, st)

    def make_forward(n):
        @jax.jit
        def run(params, cache):
            def body(c, _):
                cache, tok, off = c
                logits, cache = forward(params, cfg, tok, off, cache, ones)
                nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
                return (cache, nxt[:, None], off + 1), logits[0, 0, 0]
            (_, _, _), outs = jax.lax.scan(
                body, (cache, tok0, off0), None, length=n)
            return outs[-1]
        return lambda: run(params, cache)

    def make_nohead(n):
        @jax.jit
        def run(params, cache):
            def body(c, _):
                cache, tok, off = c
                _, cache, hid = forward(params, cfg, tok, off, cache, ones,
                                        return_hidden=True)
                # serial dep through the hidden state, token stays fixed
                nxt = (tok + hid[0, 0, 0].astype(jnp.int32) * 0)
                return (cache, nxt, off + 1), hid[0, 0, 0].astype(jnp.float32)
            (_, _, _), outs = jax.lax.scan(
                body, (cache, tok0, off0), None, length=n)
            return outs[-1]
        return lambda: run(params, cache)

    def make_head(n):
        @jax.jit
        def run(params, h0):
            def body(h, _):
                y = matmul(params["output"], h).astype(jnp.float32)
                h2 = h * (1.0 + y[0, 0, 0].astype(jnp.bfloat16) * 1e-30)
                return h2, y[0, 0, 0]
            h, outs = jax.lax.scan(body, h0, None, length=n)
            return outs[-1]
        return lambda: run(params, hidden0)

    def make_matmuls(n):
        names = [k for k in ("attn_qkv", "attn_q", "attn_k", "attn_v",
                             "attn_output", "ffn_gateup", "ffn_gate",
                             "ffn_up", "ffn_down")
                 if k in params["layers"][0]]
        dim = cfg.dim

        @jax.jit
        def run(params, h0):
            def body(h, _):
                acc = jnp.float32(0.0)
                hin = h[:, 0, :]
                for lyr in params["layers"]:
                    for nm in names:
                        w = lyr[nm]
                        xin = (hin if w.in_features == dim else
                               jnp.zeros((B, w.in_features), hin.dtype)
                               + hin[:, :1])
                        y = matmul(w, xin)
                        acc = acc + y[0, 0].astype(jnp.float32)
                h2 = h * (1.0 + acc.astype(jnp.bfloat16) * 1e-30)
                return h2, acc
            h, outs = jax.lax.scan(body, h0, None, length=n)
            return outs[-1]
        return lambda: run(params, hidden0)

    def make_sample(n):
        @jax.jit
        def run(lg0, st):
            def body(c, _):
                lg, st = c
                nxt, st = sample(lg, st)
                lp = jax.nn.log_softmax(lg, axis=-1)
                tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
                lg = lg * (1.0 + tok_lp[0] * 1e-30)
                return (lg, st), tok_lp[0]
            (_, _), outs = jax.lax.scan(body, (lg0, st), None, length=n)
            return outs[-1]
        return lambda: run(logits0, st)

    def make_norms(n):
        # 2 rms_norms per layer per step (attn_norm + ffn_norm) = 64 norms
        w = jnp.ones(cfg.dim, jnp.float32)

        @jax.jit
        def run(h0):
            from ..models.llama import rms_norm

            def body(h, _):
                for _i in range(2 * cfg.n_layers):
                    h = rms_norm(h, w, 1e-5) * (1.0 + 1e-30)
                return h, h[0, 0, 0].astype(jnp.float32)
            h, outs = jax.lax.scan(body, h0, None, length=n)
            return outs[-1]
        return lambda: run(hidden0)

    def make_flashonly(n):
        # the per-layer flash attention calls alone: 32 kernel calls per
        # step on a fixed cache at the bench offset (no KV write, no rope)
        from ..ops.flash_attention import flash_attention
        H, KVH, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        q0 = jnp.zeros((B, 1, H, hd), jnp.bfloat16) + 0.01
        kc = jnp.zeros((B, KVH, S, hd), jnp.bfloat16) + 0.01
        vc = jnp.zeros((B, KVH, S, hd), jnp.bfloat16) + 0.01

        @jax.jit
        def run(q0, kc, vc):
            def body(q, _):
                acc = jnp.float32(0.0)
                for _i in range(cfg.n_layers):
                    ctx = flash_attention(q, kc, vc, off0)
                    acc = acc + ctx[0, 0, 0, 0].astype(jnp.float32)
                    # serial dep: stop XLA CSE-ing 32 identical calls
                    q = q * (1.0 + ctx[:1, :1, :1, :1].astype(q.dtype)
                             * 1e-30)
                return q, acc
            q, outs = jax.lax.scan(body, q0, None, length=n)
            return outs[-1]
        return lambda: run(q0, kc, vc)

    def make_kvwrite(n):
        # 64 donated dynamic-update-slice cache writes per step
        from ..models.llama import _write_kv
        KVH, hd = cfg.n_kv_heads, cfg.head_dim
        new0 = jnp.zeros((B, 1, KVH, hd), jnp.bfloat16) + 0.01

        @jax.jit
        def run(cache, new):
            def body(c, _):
                cache, off = c
                k = list(cache.k)
                v = list(cache.v)
                for i in range(cfg.n_layers):
                    k[i] = _write_kv(cache.k[i], new, off)
                    v[i] = _write_kv(cache.v[i], new, off)
                from ..models.llama import KVCache
                return (KVCache(k=tuple(k), v=tuple(v)), off + 1), \
                    k[0][0, 0, 0, 0].astype(jnp.float32)
            (_, _), outs = jax.lax.scan(body, (cache, off0), None, length=n)
            return outs[-1]
        from ..models.llama import KVCache
        c0 = KVCache.zeros(cfg, B, S)     # always its own bf16 cache
        return lambda: run(c0, new0)

    makers = {"full": make_full, "full_lp": make_full_lp,
              "forward": make_forward,
              "nohead": make_nohead, "head": make_head,
              "matmuls": make_matmuls, "sample": make_sample,
              "norms": make_norms, "flashonly": make_flashonly,
              "kvwrite": make_kvwrite}
    if args.only:
        keep = set(args.only.split(","))
        makers = {k: v for k, v in makers.items() if k in keep}

    short, long_ = args.steps, 5 * args.steps
    results: dict = {}
    for name, maker in makers.items():
        try:
            s = _slope({short: maker(short), long_: maker(long_)},
                       short, long_)
        except Exception as e:  # noqa: BLE001
            log(f"[decompose] {name}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:160]}")
            results[name] = None
            continue
        results[name] = round(s * 1e3, 3)
        log(f"[decompose] {name:10s} {s * 1e3:.3f} ms/step")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
