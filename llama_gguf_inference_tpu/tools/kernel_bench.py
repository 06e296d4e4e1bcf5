"""Kernel microbenchmark: achieved HBM bandwidth of the dequant-matmul zoo.

Measures packed-code streaming rate (GB/s) per (format, shape, variant) on
the current device — the decode-path figure of merit (batch-1 decode is
weight-bandwidth-bound; v5e HBM ≈ 819 GB/s).  Used to A/B the round-2
kernel variants (ops/pallas_matmul._variant) on 8B-model shapes.

Timing method: one jitted lax.scan chain of N matmuls with a serial data
dependency (prevents loop-invariant hoisting), timed end-to-end after a
warmup call — amortizes the per-dispatch latency of the remote TPU runtime
(DEBUGGING.md "measure marginal, not end-to-end").

Usage:
    python -m llama_gguf_inference_tpu.tools.kernel_bench \
        [--formats q4_k,q6_k,q8_0] [--variants base,xsum,int8] \
        [--shapes 4096x4096,14336x4096,4096x14336] [--steps 32] [--json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_weight(fmt: str, out_f: int, in_f: int):
    """Quantize a 1M-value pool once and tile its wire bytes (bench.py
    trick): bandwidth is value-independent, and a direct encode of an
    8B-shape tensor through the IQ codebook search takes tens of minutes
    host-side."""
    from ..gguf.constants import GGMLType, type_block_info
    from ..quant import quantize
    from ..quant.repack import repack, to_quant_linear

    gtype = GGMLType[fmt.upper()]
    rng = np.random.default_rng(0)
    pool = (rng.standard_normal(1 << 20) * 0.02).astype(np.float32)
    qp = np.frombuffer(quantize(pool.reshape(1, -1), gtype), np.uint8)
    blk, bpb = type_block_info(gtype)
    nbytes = out_f * in_f // blk * bpb
    raw = np.tile(qp, -(-nbytes // qp.size))[:nbytes]
    return to_quant_linear(repack(raw, gtype, out_f, in_f))


def packed_bytes(ql) -> int:
    total = ql.codes.nbytes + ql.d.nbytes
    for arr in (ql.sc, ql.dmin, ql.mn):
        if arr is not None:
            total += arr.nbytes
    return total


def bench_one(ql, batch: int, steps: int, reps: int = 5) -> float:
    """Seconds per matmul call — MARGINAL cost from two chain lengths.

    The remote (axon) TPU runtime costs ~30 ms per dispatch+result-fetch,
    and ``block_until_ready`` can return before execution completes, so a
    single chain's wall clock measures the relay, not the kernel (this
    artifact produced the bogus round-2 "51 GB/s" readings).  Instead: time
    chains of ``steps`` and ``5*steps`` matmuls with a forced host fetch of
    the scalar result, and report the slope — fixed overhead cancels.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_matmul import pallas_quant_matmul

    in_f, out_f = ql.in_features, ql.out_features
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (batch, in_f)).astype(np.float32), jnp.bfloat16)

    def make_chain(n):
        # the weight rides as a jit ARG, not a closure constant: closed-over
        # arrays embed into the HLO, which the remote-compile relay rejects
        # for GB-scale weights (HTTP 413) and which skews compile time
        @jax.jit
        def chain(w, x0):
            def body(c, _):
                # serial dependency: each step's input depends on the
                # previous step's output so XLA cannot hoist or parallelize
                y = pallas_quant_matmul(w, x0 * (1.0 + c * 1e-30))
                return y.astype(jnp.float32).ravel()[0] * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return chain

    short, long_ = steps, 5 * steps
    chains = {n: make_chain(n) for n in (short, long_)}
    for n, fn in chains.items():
        float(np.asarray(fn(ql, x)))      # compile + warm (forced fetch)

    def timed(n):
        t0 = time.perf_counter()
        float(np.asarray(chains[n](ql, x)))   # host fetch == real completion
        return time.perf_counter() - t0

    # alternate short/long to decorrelate drift; median of per-pair slopes
    slopes = []
    for _ in range(reps):
        slopes.append((timed(long_) - timed(short)) / (long_ - short))
    return float(np.median(slopes))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--formats", default="q4_k")
    ap.add_argument("--variants", default="base,xsum,int8")
    ap.add_argument("--shapes", default="4096x4096,14336x4096,4096x14336")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import os

    from ..utils.platform import apply_platform_env
    apply_platform_env()   # honor JAX_PLATFORMS=cpu for off-TPU smokes

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    dev = jax.devices()[0]
    log(f"[kbench] device: {dev} ({dev.platform})")

    results = []
    for fmt in args.formats.split(","):
        for shape in args.shapes.split(","):
            out_f, in_f = (int(v) for v in shape.split("x"))
            log(f"[kbench] build {fmt} {out_f}x{in_f}...")
            ql = build_weight(fmt, out_f, in_f)
            nbytes = packed_bytes(ql)
            for var in args.variants.split(","):
                os.environ["LGT_MM_VARIANT"] = var
                try:
                    t = bench_one(ql, args.batch, args.steps)
                except Exception as e:  # noqa: BLE001
                    log(f"[kbench] {fmt} {shape} {var}: FAILED {type(e).__name__}: "
                        f"{str(e).splitlines()[0][:200]}")
                    results.append(dict(fmt=fmt, shape=shape, variant=var,
                                        error=str(e).splitlines()[0][:200]))
                    continue
                gbs = nbytes / t / 1e9
                r = dict(fmt=fmt, shape=shape, variant=var,
                         ms=round(t * 1e3, 4), gbs=round(gbs, 1),
                         pct_roofline=round(100 * gbs / 819.0, 1))
                results.append(r)
                log(f"[kbench] {fmt} {shape} {var}: {r['ms']} ms  "
                    f"{r['gbs']} GB/s  ({r['pct_roofline']}% roofline)")
    if args.json:
        print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
