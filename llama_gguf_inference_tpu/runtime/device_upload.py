"""Bulk host→device weight upload: chunked blob transfers + on-device carve.

Warm boot is dominated by the host→device link, not disk (VERDICT r1 weak
#10 follow-up; on this machine the axon relay sustains ~0.1 GB/s after a
~1.3 GB burst window, and every transfer pays a per-dispatch round trip).
Shipping an 8B model as ~680 per-array transfers wastes both: per-array
overhead AND 30% extra bytes, because the kernels' FLAT scale layout for
4-bit formats is larger than the wire-dense compact hierarchy.

This module instead:

1. memory-maps the layout cache's single ``data.bin`` blob
   (``runtime.layout_cache``, arrays stored COMPACT — canonical form),
2. slices it into multi-hundred-MB chunks of consecutive whole tensors and
   ships each chunk as ONE ``device_put`` (window of 2 in flight, so the
   next transfer streams while the previous chunk is carved),
3. carves every chunk on device with one jitted function per chunk layout:
   slice → bitcast → reshape per array, plus the compact→flat relayout
   (packed-code transpose + one IEEE f32 ``d*sc`` product per sub-block)
   for formats whose kernels want flat scales — bit-identical to the
   host-side ``quant.repack.flatten_repacked`` (pinned in
   tests/test_device_upload.py).

Carve programs are tiny relayout graphs; they hit the persistent XLA
compile cache on every boot after the first.  Peak device memory per chunk
is chunk + carved outputs (inputs are donated where the backend supports
it).

Env: ``LGT_UPLOAD=tensor`` disables (per-tensor transfers, the round-1
path); ``LGT_UPLOAD_CHUNK_MB`` sets the chunk size (default 512).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import QuantLinear

_FIELDS = ("codes", "d", "sc", "dmin", "mn")
_carve_cache: dict[tuple, "jax.stages.Wrapped"] = {}


def upload_enabled() -> bool:
    return os.environ.get("LGT_UPLOAD", "blob").lower() != "tensor"


def _chunk_bytes() -> int:
    return int(os.environ.get("LGT_UPLOAD_CHUNK_MB", "512")) * 1024 * 1024


def _tensor_sig(meta: dict, base: int) -> tuple:
    """Hashable carve spec for one tensor, offsets relative to ``base``."""
    arrays = tuple(
        (f, spec[0] - base, spec[1], spec[2], tuple(spec[3]))
        for f, spec in ((f, meta["arrays"].get(f)) for f in _FIELDS)
        if spec is not None)
    return (arrays, meta["fmt"], meta["bits"], meta["sub_size"],
            meta["d_size"], meta["code_bias"], meta["out"], meta["in"])


def _bitcast(seg: jax.Array, dtype: np.dtype) -> jax.Array:
    """1-D uint8 → 1-D ``dtype`` (little-endian, matching numpy memmaps).

    Wide dtypes are rebuilt from strided byte planes instead of a
    ``reshape(-1, k)`` + bitcast: a u8[m, k] intermediate would pad its
    minor dim k to 128 lanes under the TPU tiled layout — a 32× memory
    blowup that OOMs HBM at compile time for multi-hundred-MB chunks.
    Byte-plane OR is exact (pure integer ops), and scale arrays are a
    small fraction of the chunk so the 4× re-read is noise.
    """
    if dtype.itemsize == 1:
        return jax.lax.bitcast_convert_type(seg, dtype)
    k = dtype.itemsize
    n = seg.shape[0] // k
    word = None
    for i in range(k):
        plane = jax.lax.slice(seg, (i,), (i + (n - 1) * k + 1,), (k,))
        p = plane.astype(jnp.uint32) << (8 * i)
        word = p if word is None else word | p
    if k == 2:
        word = word.astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(word, dtype)


def _carve_one(chunk: jax.Array, sig: tuple) -> dict[str, jax.Array]:
    """Emit one tensor's final device arrays from the chunk (traced)."""
    arrays_spec, fmt, bits, sub, dsz, bias, out_f, in_f = sig
    arrs: dict[str, jax.Array] = {}
    for field, off, nbytes, dstr, shape in arrays_spec:
        seg = jax.lax.slice(chunk, (off,), (off + nbytes,))
        arrs[field] = _bitcast(seg, np.dtype(dstr)).reshape(shape)

    from ..quant.repack import device_scale_layout
    layout = "compact" if dsz == sub else device_scale_layout(
        bits, fmt, has_min="dmin" in arrs, bias=bias)
    if layout == "compact":
        return arrs

    # compact → flat relayout, mirroring quant.repack.flatten_repacked:
    g = dsz // sub
    nd = in_f // dsz
    groups = sub * bits // 8
    codes = (arrs["codes"].reshape(out_f, groups, g, nd)
             .transpose(0, 1, 3, 2).reshape(out_f, groups * nd * g))

    def expand(d_arr, sc_arr):
        if sc_arr is None:
            return jnp.repeat(d_arr, g, axis=1)
        prod = d_arr[:, None, :] * sc_arr.reshape(
            out_f, g, nd).astype(jnp.float32)
        return prod.transpose(0, 2, 1).reshape(out_f, nd * g)

    flat = {"codes": codes, "d": expand(arrs["d"], arrs.get("sc"))}
    if layout == "mixed":
        # mixed (quant.repack.mixed_repacked): min side stays hierarchical
        flat["dmin"] = arrs["dmin"]
        flat["mn"] = arrs["mn"]
        return flat
    if "dmin" in arrs:
        flat["dmin"] = expand(arrs["dmin"], arrs.get("mn"))
    return flat


def _get_carve_fn(chunk_sig: tuple):
    # key on the scale-layout policy too: the flatten decision is baked in
    # at trace time, and tests flip LGT_SCALE_LAYOUT within one process
    from ..quant.repack import scale_layout
    key = (scale_layout(), chunk_sig)
    fn = _carve_cache.get(key)
    if fn is not None:
        return fn

    def carve(chunk):
        # list of {field: array} dicts — dict keys are pytree structure,
        # so the jit output is pure arrays
        return [_carve_one(chunk, sig) for sig in chunk_sig]

    # no donation: the u8 chunk's layout can't alias any carved output, so
    # donating only buys a warning; peak memory is bounded by the chunk
    # window (2) + carved outputs either way
    fn = jax.jit(carve)
    _carve_cache[key] = fn
    return fn


def _to_quant_linear(meta: dict, arrs: dict[str, jax.Array]) -> QuantLinear:
    flattened = "sc" not in arrs and meta["d_size"] > meta["sub_size"]
    # mixed carve: codes/d flat but the min hierarchy survived intact
    mixed = flattened and "mn" in arrs
    return QuantLinear(
        codes=arrs["codes"], d=arrs["d"], sc=arrs.get("sc"),
        dmin=arrs.get("dmin"), mn=arrs.get("mn"),
        fmt=meta["fmt"], bits=meta["bits"], sub_size=meta["sub_size"],
        d_size=meta["sub_size"] if flattened else meta["d_size"],
        code_bias=meta["code_bias"],
        out_features=meta["out"], in_features=meta["in"],
        min_size=meta["d_size"] if mixed else 0,
    )


def bulk_upload(cache, names: list[str]) -> dict[str, QuantLinear]:
    """Ship ``names`` from the cache blob to the default device.

    Returns {name: QuantLinear}; arrays are bit-identical to
    ``to_quant_linear(cache.get(name))`` (the per-tensor path).
    """
    entries = cache.entries_in_offset_order(names)
    if len(entries) != len(set(names)):
        missing = set(names) - {n for n, _ in entries}
        raise KeyError(f"tensors not in layout cache: {sorted(missing)[:5]}")
    blob = np.memmap(cache.blob_path, dtype=np.uint8, mode="r")

    # group physically-consecutive tensors into chunks
    limit = _chunk_bytes()
    chunks: list[list[tuple[str, dict]]] = []
    spans: list[tuple[int, int]] = []
    for name, meta in entries:
        lo = min(s[0] for s in meta["arrays"].values() if s is not None)
        hi = max(s[0] + s[1] for s in meta["arrays"].values() if s is not None)
        if chunks and hi - spans[-1][0] <= limit:
            chunks[-1].append((name, meta))
            spans[-1] = (spans[-1][0], max(spans[-1][1], hi))
        else:
            chunks.append([(name, meta)])
            spans.append((lo, hi))

    def start_transfer(i: int):
        lo, hi = spans[i]
        return jax.device_put(blob[lo:hi])

    results: dict[str, QuantLinear] = {}
    in_flight: dict[int, jax.Array] = {}
    window = 2
    for i in range(min(window, len(chunks))):
        in_flight[i] = start_transfer(i)
    for i, group in enumerate(chunks):
        dev_chunk = in_flight.pop(i)
        if i + window < len(chunks):
            in_flight[i + window] = start_transfer(i + window)
        base = spans[i][0]
        sig = tuple(_tensor_sig(meta, base) for _, meta in group)
        outs = _get_carve_fn(sig)(dev_chunk)
        del dev_chunk
        for (name, meta), fields in zip(group, outs):
            results[name] = _to_quant_linear(meta, fields)
    return results
