"""Acceptance-controlled speculative-decoding benchmark.

Round-2 left speculation with no demonstrated win: random-weight drafts
accept ~5% and lose (62 vs 106 tok/s, DEBUGGING.md).  This tool separates
the MACHINERY from the CONTENT by pinning acceptance at both ends:

- ``high``: target AND draft are *echo models* (``bench.bench_model_path
  (..., echo=True)``) — block weights zeroed so logits peak at the input
  token; both models deterministically repeat the last token, so draft
  acceptance is ~100%.  Same shapes/quant/HBM traffic as the real bench
  model: this is the true upper bound of ``--model-draft`` on this
  hardware (llama-server parity target, SURVEY §8 9c).
- ``ngram``: echo target, no draft model — lookup speculation over the
  sequence's own history (llama.cpp "lookup decoding"); repetitive
  output is its headline case.
- ``gate``: RANDOM-weight target + draft (acceptance ~0) with the
  adaptive gate on — holds ~parity with plain decode instead of paying
  the ~40% round-2 penalty.
- ``acc25``/``acc50``/``acc75`` (r4): MID-RANGE acceptance — the target
  is a ROLLED echo model (emits t+1: walks the vocab ascending) and the
  draft rolls identically but with 75/50/25% of its output rows zeroed,
  so PER-TOKEN draft agreement is the named fraction p over the cycle.
  The engine's acceptance statistic (accepted/drafted — the same EWMA
  the gate thresholds on) then follows the geometric truncation
  p(1-p^K)/(K(1-p)): ~0.19 at p=0.5, K=5.  Together with plain + high
  these draw the tok/s-vs-acceptance curve that sets ``spec_min_accept``
  and guides ``spec_tokens``.

Usage (TPU):  python -m llama_gguf_inference_tpu.tools.spec_bench
  [--shape 8b] [--modes plain,high,acc75,acc50,acc25,ngram,gate]
  [--steps 96] [--spec-tokens 5] [--draft-shape 1b3]

Prints one JSON line per mode: {"mode", "tok_s", "acceptance", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def measure(path: str, n_steps: int, draft: str = "", ngram: bool = False,
            min_accept: float = 0.0, multi_step: int = 32,
            spec_tokens: int = 5) -> dict:
    import jax

    from llama_gguf_inference_tpu.runtime.engine import (
        EngineConfig, InferenceEngine,
    )
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    eng = InferenceEngine(path, EngineConfig(
        max_slots=1, ctx=1024, prefill_buckets=(128,), mode="quant",
        multi_step=multi_step, draft_model=draft, spec_ngram=ngram,
        spec_tokens=spec_tokens, spec_min_accept=min_accept))
    eng.start()
    try:
        prompt = list(range(3, 3 + 100))
        # warmup: compile every graph this mode will touch
        for _ in eng.generate(prompt, SamplingParams(
                temperature=0.0, max_tokens=3 * multi_step + 2)):
            pass
        times = []
        for _ in eng.generate(prompt, SamplingParams(
                temperature=0.0, max_tokens=n_steps + 1)):
            times.append(time.time())
        decode_s = times[-1] - times[0]
        tok_s = (len(times) - 1) / decode_s if decode_s > 0 else 0.0
        acc = (eng.spec_accepted / eng.spec_drafted
               if getattr(eng, "spec_drafted", 0) else None)
        return {"tok_s": round(tok_s, 2),
                "acceptance": round(acc, 3) if acc is not None else None,
                "n_tokens": len(times),
                "device": str(jax.devices()[0])}
    finally:
        eng.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default=os.environ.get("BENCH_SHAPE", "8b"))
    ap.add_argument("--modes", default="plain,high,ngram,gate")
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--spec-tokens", type=int, default=5)
    ap.add_argument("--draft-shape", default="1b")
    args = ap.parse_args()

    from ..utils.platform import apply_platform_env
    apply_platform_env()   # honor JAX_PLATFORMS=cpu for off-TPU smokes

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import bench  # repo-root bench.py: model synthesis

    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    modes = args.modes.split(",")
    draft_shape = args.draft_shape
    results = {}
    for mode in modes:
        try:
            _run_mode(mode, args, bench, draft_shape, results, modes)
        except Exception as e:  # noqa: BLE001 — one OOM'd mode must not
            # kill the sweep (the relay frees crashed HBM with a lag)
            print(json.dumps({"mode": mode, "error":
                              f"{type(e).__name__}: "
                              f"{str(e).splitlines()[0][:160]}"}), flush=True)
            time.sleep(float(os.environ.get("SPEC_BENCH_MODE_PAUSE", 120)))

    if "plain" in results:
        base = results["plain"]["tok_s"]
        for m, r in results.items():
            if m != "plain" and base:
                print(json.dumps({"summary": m,
                                  "speedup_vs_plain": round(r["tok_s"] / base, 2)}),
                      flush=True)


def _run_mode(mode, args, bench, draft_shape, results, modes):
    t0 = time.time()
    if mode == "plain":
        path = bench.bench_model_path(args.shape, echo=True)
        r = measure(path, args.steps)
    elif mode == "high":
        path = bench.bench_model_path(args.shape, echo=True)
        dpath = bench.bench_model_path(draft_shape, echo=True)
        r = measure(path, args.steps, draft=dpath,
                    spec_tokens=args.spec_tokens)
    elif mode == "ngram":
        path = bench.bench_model_path(args.shape, echo=True)
        r = measure(path, args.steps, ngram=True,
                    spec_tokens=args.spec_tokens)
    elif mode.startswith("acc"):
        # mid-acceptance points (VERDICT r3 #4): rolled echo target
        # walks the vocab ascending; the draft rolls identically but
        # has (1 - p) of its output rows zeroed, so realized
        # acceptance ~ p measured over the cycle (bench_model_path
        # roll/draft_miss docstring)
        frac = int(mode[3:]) / 100.0
        path = bench.bench_model_path(args.shape, echo=True, roll=-1)
        dpath = bench.bench_model_path(draft_shape, echo=True, roll=-1,
                                       draft_miss=1.0 - frac)
        r = measure(path, args.steps, draft=dpath,
                    spec_tokens=args.spec_tokens)
        r["per_token_agreement"] = frac
    elif mode == "gate":
        path = bench.bench_model_path(args.shape)
        dpath = bench.bench_model_path(draft_shape)
        r = measure(path, args.steps, draft=dpath, min_accept=0.2,
                    spec_tokens=args.spec_tokens)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    r.update(mode=mode, wall_s=round(time.time() - t0, 1))
    results[mode] = r
    print(json.dumps(r), flush=True)
    # the relay frees a stopped engine's HBM with a lag; without this
    # the next mode's model load ResourceExhausts (8b plain + 8b high
    # would briefly double-book ~14 GB of a 16 GB chip)
    import gc
    gc.collect()
    if mode != modes[-1]:        # no pause needed after the final mode
        time.sleep(float(os.environ.get("SPEC_BENCH_MODE_PAUSE", 120)))


if __name__ == "__main__":
    main()
