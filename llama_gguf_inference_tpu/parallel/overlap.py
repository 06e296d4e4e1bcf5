"""Explicit overlapped tensor-parallel collectives (BASELINE north-star:
"all-gather/reduce-scatter over ICI overlapped with per-layer compute").

Rounds 1-4 left row-parallel TP (attn_output, ffn_down) entirely to GSPMD:
weights sharded on the stored in-features axis, activations replicated, and
XLA inserting one fused ``all-reduce`` per projection
(``parallel/partition.py`` "nothing manual").  A fused all-reduce is a
single blocking custom call — whether it overlaps the next layer's weight
DMA is up to the XLA scheduler, which is exactly the uncertainty VERDICT r4
flagged (tp=16 projection spanning 61.7-100%).

This module takes manual control (``LGT_TP_OVERLAP=1``):

1. **Per-shard repacked weights** (:func:`stack_row_shards`): the global
   block-minor layout interleaves super-blocks across the stored axis, so a
   contiguous GSPMD shard needs *every* scale column — no rank-local
   dequant is possible.  Instead each row-parallel weight is re-indexed
   into ``tp`` standalone repacked layouts (shard r = logical in-features
   ``[r*in/tp, (r+1)*in/tp)``), stacked on a leading ``(tp,)`` axis that
   shards one-shard-per-rank.  Inside ``shard_map`` every rank then holds a
   self-contained QuantLinear and runs the normal Pallas kernel on its
   slice — the same consumption pattern as EP's stacked experts
   (``parallel/ep.py``).

2. **Explicit ring all-reduce** (:func:`ring_allreduce`): the partial
   outputs combine via reduce-scatter + all-gather built from ``2*(tp-1)``
   short ``ppermute`` stages over ICI neighbors instead of one fused
   all-reduce.  Each stage is an independent async collective-permute the
   scheduler can individually overlap with the next projection's weight
   stream (decode is HBM-bound: the MXU idles while weights stream, so any
   hop hidden under a DMA window is free) — and the decomposition makes the
   dependency structure explicit instead of hoping the fused op overlaps.

Numerical contract: bit-comparable to the GSPMD psum path (same partial
ordering per rank, f32 accumulation; tests pin token parity through the
engine).  Reference counterpart: llama.cpp has no model parallelism at all
(SURVEY.md §2.13) — this is TPU-native capability beyond the reference.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.linear import DenseLinear, QuantLinear, _register, static_field
from .mesh import AXIS_TP

_OVL_STATE: dict[str, Mesh | None] = {"mesh": None}


def set_overlap_mesh(mesh: Mesh | None) -> None:
    _OVL_STATE["mesh"] = mesh


def overlap_enabled() -> bool:
    return os.environ.get("LGT_TP_OVERLAP", "") not in ("", "0")


# --------------------------------------------------------------- re-layout
def _shard_index_maps(w: QuantLinear, tp: int):
    """Stored-axis index maps taking the GLOBAL block-minor layout to the
    per-shard layouts.

    Global stored element j = t*(g*nd) + s*nd + σ (repack.block_minor_perm);
    shard r owns super-blocks σ = r*nd_l + σ_l, i.e. logical in-features
    [r*in/tp, (r+1)*in/tp).  Packed code bytes hold elements at planar
    offsets of in/p (p = elements per byte), which correspond to
    t += sub/p — so a byte-level gather with t ranging over [0, sub/p)
    moves BOTH/ALL nibble planes correctly in one pass (each global byte's
    planes land in the same local byte's planes).
    """
    nd = w.in_features // w.d_size
    g = w.d_size // w.sub_size
    sub = w.sub_size
    nd_l = nd // tp
    p = 8 // w.bits      # elements per stored code byte (1 for int8 codes)
    tt = np.arange(sub // p)[None, :, None, None]
    ss = np.arange(g)[None, None, :, None]
    rr = np.arange(tp)[:, None, None, None]
    qq = np.arange(nd_l)[None, None, None, :]
    codes_idx = (tt * (g * nd) + ss * nd + rr * nd_l + qq).reshape(tp, -1)
    # sc/mn columns are (s, σ): col = s*nd + σ
    ss2 = np.arange(g)[None, :, None]
    sc_idx = (ss2 * nd + np.arange(tp)[:, None, None] * nd_l
              + np.arange(nd_l)[None, None, :]).reshape(tp, -1)
    return codes_idx, sc_idx, nd_l


def stack_row_shards(w: QuantLinear | DenseLinear, tp: int):
    """Re-index a row-parallel weight into ``tp`` standalone repacked
    layouts stacked on a leading (tp,) axis (in_features becomes the LOCAL
    width).  Exact: pure permutation of stored columns; each shard decodes
    to precisely its logical column slice (pinned by tests)."""
    if getattr(w, "min_size", 0):
        raise ValueError("mixed-layout weights cannot stack: the min side "
                         "keeps super-block granularity the flat-chunk "
                         "re-index does not cover (partition._row_parallel "
                         "keeps them on the GSPMD psum path)")
    in_l = w.in_features // tp
    if isinstance(w, DenseLinear):
        o = w.out_features
        stacked = w.w.reshape(o, tp, in_l).transpose(1, 0, 2)
        return DenseLinear(w=stacked, out_features=o, in_features=in_l)
    assert isinstance(w, QuantLinear)
    codes_idx, sc_idx, nd_l = _shard_index_maps(w, tp)
    o = w.out_features

    def take(a, idx):
        if a is None:
            return None
        flat = jnp.take(a, jnp.asarray(idx.reshape(-1)), axis=1)
        return flat.reshape(o, idx.shape[0], idx.shape[1]).transpose(1, 0, 2)

    def chunk(a):   # d/dmin: σ-indexed columns, shard slices are contiguous
        if a is None:
            return None
        return a.reshape(o, tp, nd_l).transpose(1, 0, 2)

    return dataclasses.replace(
        w,
        codes=take(w.codes, codes_idx),
        d=chunk(w.d), dmin=chunk(w.dmin),
        sc=take(w.sc, sc_idx), mn=take(w.mn, sc_idx),
        in_features=in_l,
    )


@_register
@dataclasses.dataclass
class RowParallelLinear:
    """Row-parallel weight in the explicit-overlap execution mode.

    ``stacked`` carries a leading (tp,) shard axis placed one-shard-per-rank
    (PartitionSpec over AXIS_TP); ``matmul`` runs the per-rank kernel under
    shard_map and combines partials with the explicit ring all-reduce.
    """

    stacked: QuantLinear | DenseLinear
    tp: int = static_field(default=1)

    @property
    def out_features(self) -> int:
        return self.stacked.out_features

    @property
    def in_features(self) -> int:
        return self.stacked.in_features * self.tp

    def matmul(self, x: jax.Array, out_dtype=None) -> jax.Array:
        return row_parallel_matmul(self, x, out_dtype)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """(out, in) logical weight reassembled from the shard stack
        (test/golden path)."""
        parts = []
        for r in range(self.tp):
            leaves = {
                f.name: (None if getattr(self.stacked, f.name) is None
                         else getattr(self.stacked, f.name)[r])
                for f in dataclasses.fields(self.stacked)
                if f.metadata.get("pytree", True)}
            shard = dataclasses.replace(self.stacked, **leaves)
            w = shard.dequantize() if isinstance(shard, DenseLinear) \
                else shard.dequantize(dtype)
            parts.append(w.astype(jnp.float32))
        return jnp.concatenate(parts, axis=1).astype(dtype)


def ring_allreduce(y: jax.Array, axis: str, tp: int) -> jax.Array:
    """All-reduce of per-rank partials via reduce-scatter + all-gather in
    2*(tp-1) neighbor ppermute stages.

    Chunks the LAST axis tp-ways; each RS stage's receive is independent of
    the local chunk add that follows (XLA emits collective-permute-start/
    done pairs it can schedule around neighboring HBM DMAs).  Falls back to
    a fused psum when the axis doesn't chunk."""
    if tp == 1:
        return y
    out = y.shape[-1]
    if out % tp or os.environ.get("LGT_TP_RING", "1") in ("0",):
        return jax.lax.psum(y, axis)
    C = out // tp
    lead = y.shape[:-1]
    yc = jnp.moveaxis(y.reshape(*lead, tp, C), -2, 0)     # (tp, ..., C)
    r = jax.lax.axis_index(axis)
    ring = [(i, (i + 1) % tp) for i in range(tp)]
    # reduce-scatter: after step s, rank r holds chunk (r - s) mod tp
    # summed over ranks r-s..r; after tp-1 steps it owns chunk (r+1) mod tp
    acc = jax.lax.dynamic_index_in_dim(yc, r, 0, keepdims=False)
    for s in range(1, tp):
        acc = jax.lax.ppermute(acc, axis, ring)
        idx = jax.lax.rem(r - s + tp, tp)
        acc = acc + jax.lax.dynamic_index_in_dim(yc, idx, 0, keepdims=False)
    g = jax.lax.all_gather(acc, axis)                     # (tp, ..., C) by rank
    order = np.array([(c - 1) % tp for c in range(tp)])   # chunk c @ rank c-1
    full = jnp.take(g, jnp.asarray(order), axis=0)
    return jnp.moveaxis(full, 0, -2).reshape(y.shape)


def _slice_out(w, start: int, count: int):
    """Static out-feature slice of a (shard-local) QuantLinear/DenseLinear —
    every stored array is out-major, so a chunk is a row range."""
    if isinstance(w, DenseLinear):
        return DenseLinear(w=jax.lax.slice_in_dim(w.w, start, start + count,
                                                  axis=0),
                           out_features=count, in_features=w.in_features)
    leaves = {f.name: getattr(w, f.name) for f in dataclasses.fields(w)
              if f.metadata.get("pytree", True)}
    sliced = {k: (None if v is None
                  else jax.lax.slice_in_dim(v, start, start + count, axis=0))
              for k, v in leaves.items()}
    return dataclasses.replace(w, **sliced, out_features=count)


def overlap_chunks() -> int:
    """Output-chunk count for the pipelined ring (LGT_TP_CHUNKS, default 4).

    The row-parallel partial y = x_l @ w_l.T is reduced per OUTPUT slice:
    all-reduce is linear, so ``AR(y)[:, c] == AR(y[:, c])`` and chunk c's
    ring stages are data-independent of chunk c+1's matmul — the scheduler
    can hide all but the final chunk's collective under the next chunk's
    HBM weight streaming (decode is bandwidth-bound; the MXU and ICI are
    otherwise idle).  Exposed collective time drops from t_coll to
    ~t_coll/C + pipeline fill; tests pin the compiled schedule actually
    interleaving ppermute-starts with later dots
    (tests/test_tp_overlap.py)."""
    return max(1, int(os.environ.get("LGT_TP_CHUNKS", "4")))


def row_parallel_matmul(w: RowParallelLinear, x: jax.Array,
                        out_dtype=None) -> jax.Array:
    """x (..., in) replicated-or-feature-sharded -> (..., out) replicated.

    in_spec shards x's feature axis over tp: the upstream column-parallel
    projections already produce exactly that layout under GSPMD, so entering
    shard_map costs zero communication on the hot path.
    """
    mesh = _OVL_STATE["mesh"]
    if mesh is None:
        raise RuntimeError("RowParallelLinear used with no overlap mesh "
                           "registered (parallel.overlap.set_overlap_mesh)")
    tp = w.tp
    dtype = out_dtype or x.dtype
    n_chunks = overlap_chunks()

    def local_fn(st_leaves, x_l):
        shard = dataclasses.replace(w.stacked, **{
            k: (None if v is None else v[0]) for k, v in st_leaves.items()})
        out_f = shard.out_features
        if n_chunks > 1 and out_f % n_chunks == 0 and out_f % tp == 0 \
                and (out_f // n_chunks) % tp == 0:
            # pipelined: per-output-chunk matmul + ring, so chunk c's
            # collective overlaps chunk c+1's weight streaming
            parts = []
            ck = out_f // n_chunks
            for c in range(n_chunks):
                sub = _slice_out(shard, c * ck, ck)
                p = sub.matmul(x_l, out_dtype=jnp.float32)
                parts.append(ring_allreduce(p, AXIS_TP, tp))
            return jnp.concatenate(parts, axis=-1).astype(dtype)
        part = shard.matmul(x_l, out_dtype=jnp.float32)
        return ring_allreduce(part, AXIS_TP, tp).astype(dtype)

    leaves = {f.name: getattr(w.stacked, f.name)
              for f in dataclasses.fields(w.stacked)
              if f.metadata.get("pytree", True)}
    nd = x.ndim
    x_spec = P(*((None,) * (nd - 1) + (AXIS_TP,)))
    spec_st = {k: (None if v is None else P(AXIS_TP)) for k, v in leaves.items()}
    # check_vma=False: the ring's all_gather result IS replicated (pinned
    # against psum by tests/test_tp_overlap.py) but the static varying-axes
    # checker cannot prove it through the axis_index-dependent accumulator
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(spec_st, x_spec), out_specs=P(),
                   check_vma=False)
    return fn(leaves, x)


def make_row_parallel(w, mesh: Mesh):
    """Build + place a RowParallelLinear on the mesh (one shard per tp
    rank, replicated over any other axes)."""
    tp = mesh.shape[AXIS_TP]
    stacked = stack_row_shards(w, tp)
    spec = NamedSharding(mesh, P(AXIS_TP))
    put = lambda a: None if a is None else jax.device_put(a, spec)  # noqa: E731
    stacked = jax.tree_util.tree_map(put, stacked)
    set_overlap_mesh(mesh)
    return RowParallelLinear(stacked=stacked, tp=tp)
