"""Post-repack layout cache: skip GGUF decode+repack on warm boots.

Cold start in the reference is bounded at <60 s to first request (reference
CLAUDE.md platform bar); our load path spends its time decoding GGML wire
blocks and repacking them into the TPU-resident layout (quant.repack).
That work is deterministic per (file, repack version), so the repacked
arrays are persisted next to the model on first load and memory-mapped on
subsequent boots — an 8B model's repack drops from minutes to disk-read
speed.  (The other cold-start cost, XLA compilation, is covered by the
persistent jax compilation cache — see InferenceEngine.)

Layout on disk (``<model>.lcache/`` by default):

    manifest.json     {"version", "fingerprint", "tensors": {name: meta}}
    <idx>_codes.bin   raw array bytes, np.memmap-able
    <idx>_d.bin ...

The manifest is written last (atomic rename), so a crash mid-population
leaves no valid manifest and the next boot rebuilds.  The fingerprint is a
fast content check: file size + sha256 of the first and last 4 MiB (full
hashes of multi-GB files would cost seconds every boot).

Env: ``LGT_LAYOUT_CACHE=0`` disables; ``LGT_LAYOUT_CACHE_DIR`` relocates
(useful when the models volume is read-only).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path

import numpy as np

from ..quant.repack import RepackedWeight

_VERSION = 3   # bump when the repacked layout changes (invalidates caches)
_PROBE = 4 * 1024 * 1024


def _layout_mode() -> str:
    """Scale-storage mode is part of cache validity (see quant.repack.rw)."""
    from ..quant.repack import scale_layout
    return scale_layout()


def _fingerprint(path: Path) -> str:
    st = path.stat()
    h = hashlib.sha256()
    h.update(str(st.st_size).encode())
    with open(path, "rb") as f:
        h.update(f.read(_PROBE))
        if st.st_size > 2 * _PROBE:
            f.seek(-_PROBE, os.SEEK_END)
            h.update(f.read(_PROBE))
    return h.hexdigest()


class LayoutCache:
    """Per-model repack cache.  ``get`` returns memmap-backed weights."""

    ARRAYS = ("codes", "d", "sc", "dmin", "mn")

    def __init__(self, cache_dir: Path, fingerprint: str):
        self.dir = cache_dir
        self.fingerprint = fingerprint
        self.tensors: dict[str, dict] = {}
        self._dirty = False
        self._next_idx = 0
        manifest = cache_dir / "manifest.json"
        if manifest.exists():
            try:
                m = json.loads(manifest.read_text())
                if (m.get("version") == _VERSION
                        and m.get("layout") == _layout_mode()
                        and m.get("fingerprint") == fingerprint):
                    self.tensors = m["tensors"]
                    self._next_idx = m.get("next_idx", len(self.tensors))
            except (json.JSONDecodeError, KeyError, OSError):
                pass

    @staticmethod
    def open(model_path: str | Path) -> "LayoutCache | None":
        if os.environ.get("LGT_LAYOUT_CACHE", "1").lower() in ("0", "false", "no"):
            return None
        model_path = Path(model_path)
        base = os.environ.get("LGT_LAYOUT_CACHE_DIR")
        if base:
            # key by absolute path, not just basename: two models named
            # model.gguf in different directories must not share (and
            # repeatedly clobber) one cache dir
            import hashlib
            tag = hashlib.sha256(
                str(model_path.resolve()).encode()).hexdigest()[:12]
            cache_dir = Path(base) / f"{model_path.name}.{tag}.lcache"
        else:
            cache_dir = model_path.with_name(model_path.name + ".lcache")
        try:
            cache_dir.mkdir(parents=True, exist_ok=True)
            fp = _fingerprint(model_path)
        except OSError:
            return None
        return LayoutCache(cache_dir, fp)

    # -- read ---------------------------------------------------------------
    def get(self, name: str) -> RepackedWeight | None:
        meta = self.tensors.get(name)
        if meta is None:
            return None
        arrays: dict[str, np.ndarray | None] = {}
        try:
            for field in self.ARRAYS:
                spec = meta["arrays"].get(field)
                if spec is None:
                    arrays[field] = None
                    continue
                fname, dtype, shape = spec
                arrays[field] = np.memmap(self.dir / fname, dtype=np.dtype(dtype),
                                          mode="r", shape=tuple(shape))
        except (OSError, ValueError):
            return None
        return RepackedWeight(
            codes=arrays["codes"], d=arrays["d"], sc=arrays["sc"],
            dmin=arrays["dmin"], mn=arrays["mn"],
            fmt=meta["fmt"], bits=meta["bits"], sub_size=meta["sub_size"],
            d_size=meta["d_size"], code_bias=meta["code_bias"],
            out_features=meta["out"], in_features=meta["in"],
        )

    # -- write --------------------------------------------------------------
    def put(self, name: str, rp: RepackedWeight) -> None:
        if name in self.tensors:
            return
        idx = self._next_idx
        self._next_idx += 1
        arrays: dict[str, list | None] = {}
        try:
            for field in self.ARRAYS:
                arr = getattr(rp, field)
                if arr is None:
                    arrays[field] = None
                    continue
                arr = np.ascontiguousarray(arr)
                fname = f"{idx:04d}_{field}.bin"
                arr.tofile(self.dir / fname)
                arrays[field] = [fname, arr.dtype.str, list(arr.shape)]
        except OSError:
            return
        self.tensors[name] = dict(
            fmt=rp.fmt, bits=rp.bits, sub_size=rp.sub_size, d_size=rp.d_size,
            code_bias=rp.code_bias, out=rp.out_features, in_=0,
        )
        # json key "in" (kept short to match get())
        self.tensors[name]["in"] = rp.in_features
        del self.tensors[name]["in_"]
        self.tensors[name]["arrays"] = arrays
        self._dirty = True

    def finalize(self) -> None:
        """Atomically publish the manifest (call after a full load)."""
        if not self._dirty:
            return
        payload = json.dumps({"version": _VERSION,
                              "layout": _layout_mode(),
                              "fingerprint": self.fingerprint,
                              "next_idx": self._next_idx,
                              "tensors": self.tensors})
        try:
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, self.dir / "manifest.json")
        except OSError:
            pass
        self._dirty = False
