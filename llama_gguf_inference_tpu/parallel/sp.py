"""Sequence parallelism: KV sharded along the sequence axis over an ``sp``
mesh axis, with distributed-softmax attention.

The reference handles long context with a single knob (``CTX`` →
``llama-server -c``; reference start.sh:157, SURVEY.md §5.7) — a sequence
never spans a device, so its context ceiling is one GPU's memory.  The
TPU-native design lifts that ceiling: the KV cache for ONE sequence is
sharded across chips along S, and attention runs as blockwise distributed
softmax (SURVEY §2.13 SP row).

Two patterns, matching the two serving phases:

- **Decode / short-q** (``sp_decode_attention``): q is tiny (one to a few
  tokens) and replicated over ``sp``; each rank computes *unnormalized*
  flash partials (acc, m, l) over its local KV shard and the results merge
  with one pmax + two psums — the log-sum-exp merge used between S-blocks
  inside the flash kernel, lifted to the mesh.  Collective volume is
  O(B·T·H·D) per layer (the q-sized output), independent of context — for
  decode this is strictly cheaper than a KV ring rotation, which would
  move O(S_loc·KVH·D) per step.
- **Prefill / long-q** (``ring_attention``): q, k, v are all sharded along
  the sequence.  KV shards rotate around the ring via ``lax.ppermute``
  (sp steps); every rank accumulates flash partials against each visiting
  shard with global-position causal masking, then normalizes locally.
  Compute and the ICI transfer of the next shard overlap across steps —
  the standard ring-attention schedule.

Positions are global: rank r owns cache slots [r·S_loc, (r+1)·S_loc); the
causal rule "key position ≤ offset + query index" is evaluated in global
coordinates on every rank, so results are bitwise independent of sp.

Numerics: fully-masked ranks (their shard is entirely in the sequence's
future) use the finite ``-1e30`` sentinel and an explicit ``where`` on the
probabilities, so their (acc=0, l=0, m=-1e30) partials merge as exact
no-ops.  All accumulation is f32, like the flash kernel.

KV writes (``sp_write_kv``): a token chunk is scattered to the owning
rank(s) with ``.at[...].set(mode="drop")`` on out-of-shard indices —
chunks that straddle a shard boundary split correctly and every other
rank's write drops.

These are building blocks (ops-level, shard_map'd, tested on the virtual
CPU mesh vs single-device attention); the serving engine composes them
when a model's context exceeds one chip's HBM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

AXIS_SP = "sp"
_NEG_INF = -1e30


def make_sp_mesh(sp: int | None = None, devices=None) -> Mesh:
    """A 1-axis ("sp",) mesh over the given devices (default: all)."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    sp = sp or len(devices)
    if len(devices) < sp:
        raise ValueError(f"need {sp} devices, have {len(devices)}")
    return Mesh(np.array(devices[:sp]), (AXIS_SP,))


# ---------------------------------------------------------------------------
# KV writes into a sequence-sharded cache
# ---------------------------------------------------------------------------

def _write_local(cache, new, offsets, *, axis):
    """cache (B, H, S_loc, D) local shard; new (B, T, H, D); offsets (B,)
    global.  Scatter each token to its owning slot; foreign tokens drop."""
    S_loc = cache.shape[2]
    r = jax.lax.axis_index(axis)
    base = r * S_loc
    T = new.shape[1]
    pos = offsets[:, None] + jnp.arange(T)[None, :]          # (B, T) global
    local = pos - base                                        # (B, T)
    # out-of-shard -> an index >= S_loc; mode="drop" discards it
    idx = jnp.where((local >= 0) & (local < S_loc), local, S_loc)
    newt = new.transpose(0, 2, 1, 3).astype(cache.dtype)      # (B, H, T, D)

    def one(c, n, i):                                         # per batch row
        return c.at[:, i, :].set(n, mode="drop")

    return jax.vmap(one)(cache, newt, idx)


def sp_write_kv(cache: jax.Array, new: jax.Array, offsets: jax.Array,
                mesh: Mesh, axis: str = AXIS_SP) -> jax.Array:
    """cache (B, H, S, D) sharded (None, None, sp, None); new (B, T, H, D)
    and offsets (B,) replicated.  Returns the updated sharded cache."""
    fn = shard_map(functools.partial(_write_local, axis=axis), mesh=mesh,
                   in_specs=(P(None, None, axis, None), P(), P()),
                   out_specs=P(None, None, axis, None), check_rep=False)
    return fn(cache, new, offsets)


# ---------------------------------------------------------------------------
# decode-phase attention: replicated q, sharded KV, LSE merge
# ---------------------------------------------------------------------------

def _partials(q, k, v, allowed, scale):
    """Unnormalized flash partials over one KV block.

    q (B, T, KVH, G, D) f32; k/v (B, KVH, L, D); allowed (B, T, L) bool.
    Returns acc (B, KVH, G, T, D), m (B, KVH, G, T), l (B, KVH, G, T).
    """
    scores = jnp.einsum("btkgd,bksd->bkgts", q,
                        k.astype(jnp.float32)) * scale
    scores = jnp.where(allowed[:, None, None, :, :], scores, _NEG_INF)
    m = scores.max(axis=-1)                                   # (B,KVH,G,T)
    p = jnp.exp(scores - m[..., None])
    # fully-masked rows: m == -1e30 makes exp(scores - m) == 1 on masked
    # slots — zero them explicitly so (acc, l) are exact no-ops
    p = jnp.where(allowed[:, None, None, :, :], p, 0.0)
    l = p.sum(axis=-1)
    acc = jnp.einsum("bkgts,bksd->bkgtd", p, v.astype(jnp.float32))
    return acc, m, l


def _decode_local(q, k_shard, v_shard, offsets, *, axis):
    B, T, H, D = q.shape
    KVH, S_loc = k_shard.shape[1], k_shard.shape[2]
    G = H // KVH
    r = jax.lax.axis_index(axis)
    base = r * S_loc

    qh = (q.astype(jnp.float32).reshape(B, T, KVH, G, D))
    pos = base + jnp.arange(S_loc)                            # global slots
    allowed = (pos[None, None, :]
               <= offsets[:, None, None] + jnp.arange(T)[None, :, None])
    acc, m, l = _partials(qh, k_shard, v_shard, allowed,
                          1.0 / jnp.sqrt(jnp.float32(D)))

    # merge across the ring: global max, rescale, sum
    m_g = jax.lax.pmax(m, axis)
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, axis)
    acc_g = jax.lax.psum(acc * corr[..., None], axis)
    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]          # (B,KVH,G,T,D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D).astype(q.dtype)


def sp_decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                        offsets: jax.Array, mesh: Mesh,
                        axis: str = AXIS_SP) -> jax.Array:
    """q (B, T, H, D) replicated; caches (B, KVH, S, D) sharded on S over
    ``axis``; offsets (B,) global.  Query t of sequence b attends to global
    slots s <= offsets[b] + t (the contig-cache contract of
    ops.flash_attention).  Returns (B, T, H, D) replicated."""
    fn = shard_map(functools.partial(_decode_local, axis=axis), mesh=mesh,
                   in_specs=(P(), P(None, None, axis, None),
                             P(None, None, axis, None), P()),
                   out_specs=P(), check_rep=False)
    return fn(q, k_cache, v_cache, offsets)


def sp_append_and_attend(q, k_new, v_new, k_cache, v_cache, offsets,
                         mesh: Mesh, axis: str = AXIS_SP):
    """One decode/prefill-chunk step against a sequence-sharded cache:
    scatter the new K/V tokens to their owning shards, then attend.

    q/k_new/v_new (B, T, H|KVH, D) replicated; caches sharded on S.
    Returns (out, k_cache, v_cache)."""

    def local(q, kn, vn, kc, vc, off):
        kc = _write_local(kc, kn, off, axis=axis)
        vc = _write_local(vc, vn, off, axis=axis)
        return _decode_local(q, kc, vc, off, axis=axis), kc, vc

    spec_c = P(None, None, axis, None)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), spec_c, spec_c, P()),
                   out_specs=(P(), spec_c, spec_c), check_rep=False)
    return fn(q, k_new, v_new, k_cache, v_cache, offsets)


# ---------------------------------------------------------------------------
# prefill-phase ring attention: q, k, v all sequence-sharded
# ---------------------------------------------------------------------------

def _ring_local(q, k, v, lengths, *, axis, sp):
    """q (B, T_loc, H, D), k/v (B, T_loc, KVH, D): this rank's chunk of a
    sequence laid out contiguously across ranks (rank r holds positions
    [r*T_loc, (r+1)*T_loc)).  Causal over global positions, keys beyond
    ``lengths`` (B,) masked.  Returns (B, T_loc, H, D)."""
    B, T_loc, H, D = q.shape
    KVH = k.shape[2]
    G = H // KVH
    r = jax.lax.axis_index(axis)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    qh = q.astype(jnp.float32).reshape(B, T_loc, KVH, G, D)
    q_pos = r * T_loc + jnp.arange(T_loc)                     # (T_loc,) global

    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)          # (B,KVH,T_loc,D)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)

    m = jnp.full((B, KVH, G, T_loc), _NEG_INF, jnp.float32)
    l = jnp.zeros((B, KVH, G, T_loc), jnp.float32)
    acc = jnp.zeros((B, KVH, G, T_loc, D), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]             # shift forward

    def step(i, carry):
        m, l, acc, kt, vt = carry
        src = (r - i) % sp                  # ring position of this kv block
        k_pos = src * T_loc + jnp.arange(T_loc)
        allowed = ((k_pos[None, None, :] <= q_pos[None, :, None])
                   & (k_pos[None, None, :] < lengths[:, None, None]))
        a_i, m_i, l_i = _partials(qh, kt, vt, allowed, scale)
        m_new = jnp.maximum(m, m_i)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(m_i - m_new)
        l = l * c_old + l_i * c_new
        acc = acc * c_old[..., None] + a_i * c_new[..., None]
        # rotate KV to the next rank.  The rotation after the final block
        # is redundant work (it restores the original placement) but keeps
        # the loop body collective-uniform — a ppermute under lax.cond is
        # exactly the shape of program XLA's SPMD partitioner rejects.
        kt = jax.lax.ppermute(kt, axis, perm)
        vt = jax.lax.ppermute(vt, axis, perm)
        return m_new, l, acc, kt, vt

    m, l, acc, _, _ = jax.lax.fori_loop(0, sp, step, (m, l, acc, kt, vt))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T_loc, H, D).astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   lengths: jax.Array, mesh: Mesh,
                   axis: str = AXIS_SP) -> jax.Array:
    """Causal self-attention with every tensor sharded along the sequence.

    q (B, T, H, D), k/v (B, T, KVH, D) sharded on T over ``axis``;
    lengths (B,) replicated (true sequence lengths; padding keys masked).
    KV shards rotate around the ring (lax.ppermute); O(T²) work is evenly
    spread, peak memory per rank is O(T/sp).  Returns q-sharded output.
    """
    sp = mesh.shape[axis]
    fn = shard_map(functools.partial(_ring_local, axis=axis, sp=sp),
                   mesh=mesh,
                   in_specs=(P(None, axis, None, None),
                             P(None, axis, None, None),
                             P(None, axis, None, None), P()),
                   out_specs=P(None, axis, None, None), check_rep=False)
    return fn(q, k, v, lengths)
