#!/usr/bin/env python3
"""Extract the IQ codebook grid tables from a llama.cpp checkout into the
.npz consumed by quant.iq_grids (env LGT_IQ_GRID_FILE).

The IQ2/IQ3/IQ1 wire formats index trained codebooks that ship as static
data inside llama.cpp's ggml-quants.c.  This environment has no network
egress, so the tables cannot be vendored; running this script against any
llama.cpp checkout produces them in one command and makes this framework's
IQ decoding bit-identical to llama.cpp for real-world GGUF files:

    python scripts/dev/extract_iq_grids.py /path/to/llama.cpp iq_grids.npz
    export LGT_IQ_GRID_FILE=$PWD/iq_grids.npz

Table names and expansion rules (public ABI):
- iq2xxs_grid (256 x u64), iq2xs_grid (512 x u64), iq2s_grid (1024 x u64):
  each u64 = 8 bytes of premultiplied magnitudes.
- iq3xxs_grid (256 x u32), iq3s_grid (512 x u32): each u32 = 4 bytes.
- iq1s_grid (2048 x u64): 8 int8 trits in {-1, 0, 1} per entry.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

TABLES = {
    # npz name -> (C symbol, entries, elems, elem signed)
    "iq2xxs": ("iq2xxs_grid", 256, 8, False),
    "iq2xs": ("iq2xs_grid", 512, 8, False),
    "iq2s": ("iq2s_grid", 1024, 8, False),
    "iq3xxs": ("iq3xxs_grid", 256, 4, False),
    "iq3s": ("iq3s_grid", 512, 4, False),
    "iq1s": ("iq1s_grid", 2048, 8, True),
}


def find_source(root: Path) -> Path:
    for rel in ("ggml/src/ggml-quants.c", "ggml-quants.c", "src/ggml-quants.c"):
        p = root / rel
        if p.exists():
            return p
    hits = list(root.rglob("ggml-quants.c"))
    if hits:
        return hits[0]
    raise SystemExit(f"ggml-quants.c not found under {root}")


def parse_table(text: str, symbol: str, entries: int, elems: int,
                signed: bool) -> np.ndarray:
    m = re.search(rf"{symbol}\s*\[\s*\d*\s*\]\s*=\s*\{{(.*?)\}}\s*;",
                  text, re.DOTALL)
    if not m:
        raise SystemExit(f"table {symbol} not found")
    vals = [int(v, 0) for v in re.findall(r"0x[0-9a-fA-F]+|\d+", m.group(1))]
    if len(vals) != entries:
        raise SystemExit(f"{symbol}: {len(vals)} values, expected {entries}")
    width = 8 if elems == 8 else 4
    out = np.zeros((entries, elems), dtype=np.int8)
    for k, word in enumerate(vals):
        for j in range(elems):
            b = (word >> (8 * j)) & 0xFF
            out[k, j] = np.int8(np.uint8(b)) if signed else np.int8(b)
    del width
    return out


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    src = find_source(Path(argv[1]))
    text = src.read_text(errors="replace")
    arrays = {}
    for name, (symbol, entries, elems, signed) in TABLES.items():
        arrays[name] = parse_table(text, symbol, entries, elems, signed)
        print(f"{name}: {arrays[name].shape} from {symbol}")
    np.savez(argv[2], **arrays)
    print(f"wrote {argv[2]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
