"""Requantize a GGUF model file — the llama.cpp ``quantize`` tool counterpart.

Reads any GGUF whose tensors we can decode, re-encodes weight matrices into a
target block format, and writes a new spec-compliant GGUF.  Norm vectors and
small tensors stay F32; the output head gets a higher-precision format by
default (Q6_K for 4-bit targets — the _M convention).

Usage:
    python -m llama_gguf_inference_tpu.tools.quantize in.gguf out.gguf Q4_K_M
    python -m llama_gguf_inference_tpu.tools.quantize in.gguf out.gguf q8_0 \
        --output-type q8_0
"""

from __future__ import annotations

import argparse
import sys
import time

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..quant.numpy_ref import quantize as encode

# user-facing names -> (matrix type, output-head type)
PRESETS: dict[str, tuple[GGMLType, GGMLType]] = {
    "Q4_K_M": (GGMLType.Q4_K, GGMLType.Q6_K),
    "Q4_K_S": (GGMLType.Q4_K, GGMLType.Q4_K),
    "Q5_K_M": (GGMLType.Q5_K, GGMLType.Q6_K),
    "Q3_K_M": (GGMLType.Q3_K, GGMLType.Q6_K),
    "Q2_K": (GGMLType.Q2_K, GGMLType.Q6_K),
    "Q6_K": (GGMLType.Q6_K, GGMLType.Q6_K),
    "Q8_0": (GGMLType.Q8_0, GGMLType.Q8_0),
    "Q5_0": (GGMLType.Q5_0, GGMLType.Q5_0),
    "Q4_0": (GGMLType.Q4_0, GGMLType.Q4_0),
    "IQ4_NL": (GGMLType.IQ4_NL, GGMLType.Q6_K),
    "IQ4_XS": (GGMLType.IQ4_XS, GGMLType.Q6_K),
    "F16": (GGMLType.F16, GGMLType.F16),
    "BF16": (GGMLType.BF16, GGMLType.BF16),
}

_KEEP_F32_SUFFIXES = ("_norm.weight",)


def _target_for(name: str, shape, mat_type: GGMLType, out_type: GGMLType,
                blk: int) -> GGMLType:
    if any(name.endswith(s) for s in _KEEP_F32_SUFFIXES) or len(shape) == 1:
        return GGMLType.F32
    if name == "output.weight":
        t = out_type
    elif name == "token_embd.weight":
        t = mat_type
    else:
        t = mat_type
    # block divisibility: fall back to Q8_0 then F16
    in_f = shape[-1]
    from ..gguf.constants import type_block_info
    for cand in (t, GGMLType.Q8_0, GGMLType.F16):
        b, _ = type_block_info(cand)
        if in_f % b == 0:
            return cand
    return GGMLType.F32


def quantize_file(src: str, dst: str, preset: str,
                  output_type: str | None = None, verbose: bool = True) -> dict:
    preset = preset.upper()
    if preset not in PRESETS:
        raise SystemExit(f"unknown preset {preset!r}; choose from "
                         f"{', '.join(sorted(PRESETS))}")
    mat_type, out_type = PRESETS[preset]
    if output_type:
        out_type = GGMLType[output_type.upper()]

    r = GGUFReader(src)
    w = GGUFWriter(dst, alignment=r.alignment)
    for k, v in r.metadata.items():
        if k == "general.file_type":
            continue
        w.add(k, v)

    stats = {"tensors": 0, "converted": 0, "in_bytes": 0, "out_bytes": 0}
    for name, info in r.tensors.items():
        data = r.tensor_f32(name)
        target = _target_for(name, info.shape, mat_type, out_type, 0)
        raw = encode(data, target)
        # ggml dims: reverse of numpy shape
        w.add_raw_tensor(name, tuple(reversed(info.shape)), target, raw)
        stats["tensors"] += 1
        stats["converted"] += int(target != info.ggml_type)
        stats["in_bytes"] += info.nbytes
        stats["out_bytes"] += len(raw)
        if verbose:
            print(f"  {name}: {info.ggml_type.name} -> {target.name} "
                  f"({len(raw) / 1e6:.1f} MB)", file=sys.stderr)
    w.write()
    r.close()
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="quantize",
                                description="Requantize a GGUF model")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("preset", help=", ".join(sorted(PRESETS)))
    p.add_argument("--output-type", default=None,
                   help="override the output.weight format")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)
    t0 = time.time()
    stats = quantize_file(args.src, args.dst, args.preset,
                          args.output_type, verbose=not args.quiet)
    print(f"wrote {args.dst}: {stats['tensors']} tensors, "
          f"{stats['in_bytes'] / 1e9:.2f} -> {stats['out_bytes'] / 1e9:.2f} GB "
          f"in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
