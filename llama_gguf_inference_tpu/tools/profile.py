"""jax.profiler trace capture around engine decode steps.

The reference's only performance observation is its benchmark CLI
(SURVEY.md §5.1); the TPU equivalent adds an in-process profiler so
per-step time can be decomposed (dispatch vs kernel vs fetch) instead of
wall-clock-only guessing.  Produces a TensorBoard-compatible trace
directory (xplane protos) viewable with `tensorboard --logdir <out>` or
xprof.

Usage:
    python -m llama_gguf_inference_tpu.tools.profile \
        --model /path/model.gguf [--out /tmp/lgt_trace] [--steps 16] \
        [--prompt-tokens 64] [--multi-step 8] [--mode quant]

Notes for this machine (remote axon TPU): device-side trace events may be
unavailable through the relay — the capture still records host-side
dispatch/transfer timelines, which is where the ~30 ms per-fetch relay
overhead shows up (DEBUGGING.md).  On directly attached TPUs the full
device timeline appears.
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", default="/tmp/lgt_trace")
    ap.add_argument("--steps", type=int, default=16,
                    help="decode tokens to capture")
    ap.add_argument("--prompt-tokens", type=int, default=64)
    ap.add_argument("--multi-step", type=int, default=8)
    ap.add_argument("--mode", default="quant", choices=("quant", "dense"))
    args = ap.parse_args(argv)

    import jax

    from ..runtime.engine import EngineConfig, InferenceEngine
    from ..runtime.sampler import SamplingParams

    log(f"[profile] device: {jax.devices()[0]}")
    eng = InferenceEngine(args.model, EngineConfig(
        max_slots=1, ctx=max(512, args.prompt_tokens + args.steps + 8),
        prefill_buckets=(128,), mode=args.mode, multi_step=args.multi_step))
    eng.start()
    prompt = list(range(3, 3 + args.prompt_tokens))
    p = SamplingParams(temperature=0.0, max_tokens=args.steps + 1)

    # warmup: compile every graph OUTSIDE the trace window
    for _ in eng.generate(prompt, SamplingParams(temperature=0.0,
                                                 max_tokens=args.multi_step + 2)):
        pass
    log("[profile] warm; capturing trace...")

    jax.profiler.start_trace(args.out)
    t0 = time.time()
    n = 0
    try:
        for _ in eng.generate(prompt, p):
            n += 1
    finally:
        jax.profiler.stop_trace()
    dt = time.time() - t0
    eng.stop()
    log(f"[profile] {n} tokens in {dt:.3f}s "
        f"({(n - 1) / dt:.1f} tok/s) -> trace in {args.out}")
    print(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
