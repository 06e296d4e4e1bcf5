"""Paged KV cache: a shared page pool + per-slot page tables.

The contiguous cache (runtime.kv_cache / models.llama.KVCache) splits CTX
statically across slots — a slot can never hold more than CTX/max_slots
tokens even when every other slot is idle.  llama.cpp (the reference's
backend) instead keeps ONE unified KV buffer whose cells are assigned to
sequences on demand; this module is the TPU-native equivalent
(SURVEY.md §7 step 4; VERDICT r1 weak #3 "no paged KV allocator"):

- per layer, K and V live in a ``(P, KVH, page_s, D)`` physical page pool;
- ``page_table`` (B, NP) int32 maps slot b's logical page j to a physical
  page (-1 = unassigned);
- the engine reserves pages at admission (prompt + max_tokens rounded up),
  so decode never allocates mid-flight — XLA's static-shape world keeps
  the whole step jitted with the table as a plain int32 operand;
- ``ops.flash_attention.flash_attention_paged`` consumes the pool directly:
  the table rides scalar prefetch and each S-block's DMA source address is
  an SMEM lookup — a paged-attention gather with no HBM gather op.

Writes are ONE scatter per layer (positions -> (physical page, in-page
slot)); out-of-reservation positions carry table entries of -1, which XLA
scatter drops (FILL_OR_DROP) — padded prefill tails are discarded for
free.  The XLA fallback path (CPU tests, unsupported shapes) gathers the
logical view ``(B, KVH, NP*page_s, D)`` with plain indexing; -1 entries
wrap to the last page and are hidden by the causal mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig


class PagedKV(NamedTuple):
    """k/v: L-tuples of (P, KVH, page_s, D); page_table: (B, NP) int32."""

    k: tuple
    v: tuple
    page_table: jax.Array

    @staticmethod
    def zeros(cfg: ModelConfig, batch: int, pool_pages: int, page_s: int,
              dtype=jnp.bfloat16) -> "PagedKV":
        shape = (pool_pages, cfg.n_kv_heads, page_s, cfg.head_dim)
        return PagedKV(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)),
            page_table=jnp.full((batch, pool_pages), -1, jnp.int32),
        )

    # ------------------------------------------------------------ geometry
    @property
    def page_s(self) -> int:
        return self.k[0].shape[2]

    @property
    def pool_pages(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_seq(self) -> int:
        """Logical capacity per slot: any slot may use the whole pool."""
        return self.page_table.shape[1] * self.page_s

    # ------------------------------------------------------- model-facing
    def write(self, layer: int, k: jax.Array, v: jax.Array,
              offsets: jax.Array) -> "PagedKV":
        """k/v (B, T, KVH, D) from the projections -> pool scatter."""
        def ts(t, v_):
            return t[:layer] + (v_,) + t[layer + 1:]

        kp = _write_paged(self.k[layer], k, offsets, self.page_table)
        vp = _write_paged(self.v[layer], v, offsets, self.page_table)
        return PagedKV(k=ts(self.k, kp), v=ts(self.v, vp),
                       page_table=self.page_table)

    def gather(self, layer: int) -> tuple[jax.Array, jax.Array]:
        """Logical (B, KVH, NP*page_s, D) views for the XLA fallback path."""
        return (_gather_paged(self.k[layer], self.page_table),
                _gather_paged(self.v[layer], self.page_table))


def _write_paged(pool: jax.Array, new: jax.Array, offsets: jax.Array,
                 pt: jax.Array) -> jax.Array:
    """pool (P, KVH, page_s, D) <- new (B, T, KVH, D) at logical positions
    offsets[b] + t, routed through the page table.  One scatter op."""
    P, KVH, page_s, D = pool.shape
    B, T = new.shape[0], new.shape[1]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # (B,T)
    lp = jnp.clip(pos // page_s, 0, pt.shape[1] - 1)
    phys = jnp.take_along_axis(pt, lp, axis=1)                        # (B,T)
    within = pos % page_s
    # unassigned pages carry -1 -> out-of-bounds scatter index -> dropped
    phys = jnp.where(phys < 0, P, phys)
    upd = new.reshape(B * T, KVH, D)
    return pool.at[phys.reshape(-1), :, within.reshape(-1), :].set(
        upd.astype(pool.dtype), mode="drop")


def _gather_paged(pool: jax.Array, pt: jax.Array) -> jax.Array:
    """(B, KVH, NP*page_s, D) logical view (XLA fallback only — this
    materializes the gather; the Pallas kernel never does)."""
    P, KVH, page_s, D = pool.shape
    B, NP = pt.shape
    g = pool[jnp.clip(pt, 0, P - 1)]          # (B, NP, KVH, page_s, D)
    return (g.transpose(0, 2, 1, 3, 4)
            .reshape(B, KVH, NP * page_s, D))


class PagedQuantKV(NamedTuple):
    """Paged pools with q8_0 codes (llama-server ``--cache-type-k q8_0``
    over its unified cache): k_q/v_q L-tuples of (P, KVH, page_s, D) int8,
    k_s/v_s L-tuples of (P, KVH, page_s) f32 per-(token, head) scales,
    plus the shared page_table.  Write/gather mirror :class:`PagedKV`;
    the codec is :class:`runtime.kv_cache.QuantKV`'s symmetric absmax.
    Removes the paged×quantized-KV rejection (VERDICT r4 weak list)."""

    k_q: tuple
    k_s: tuple
    v_q: tuple
    v_s: tuple
    page_table: jax.Array

    @staticmethod
    def zeros(cfg: ModelConfig, batch: int, pool_pages: int, page_s: int
              ) -> "PagedQuantKV":
        qshape = (pool_pages, cfg.n_kv_heads, page_s, cfg.head_dim)
        sshape = (pool_pages, cfg.n_kv_heads, page_s)
        L = cfg.n_layers
        return PagedQuantKV(
            k_q=tuple(jnp.zeros(qshape, jnp.int8) for _ in range(L)),
            k_s=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(L)),
            v_q=tuple(jnp.zeros(qshape, jnp.int8) for _ in range(L)),
            v_s=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(L)),
            page_table=jnp.full((batch, pool_pages), -1, jnp.int32),
        )

    @property
    def page_s(self) -> int:
        return self.k_q[0].shape[2]

    @property
    def pool_pages(self) -> int:
        return self.k_q[0].shape[0]

    @property
    def max_seq(self) -> int:
        return self.page_table.shape[1] * self.page_s

    def write(self, layer: int, k: jax.Array, v: jax.Array,
              offsets: jax.Array) -> "PagedQuantKV":
        from .kv_cache import QuantKV

        def ts(t, v_):
            return t[:layer] + (v_,) + t[layer + 1:]

        kq, ks = QuantKV.quantize(k)          # (B, T, KVH, D)/(B, T, KVH)
        vq, vs = QuantKV.quantize(v)
        return PagedQuantKV(
            k_q=ts(self.k_q, _write_paged(self.k_q[layer], kq, offsets,
                                          self.page_table)),
            k_s=ts(self.k_s, _write_paged_scale(self.k_s[layer], ks,
                                                offsets, self.page_table)),
            v_q=ts(self.v_q, _write_paged(self.v_q[layer], vq, offsets,
                                          self.page_table)),
            v_s=ts(self.v_s, _write_paged_scale(self.v_s[layer], vs,
                                                offsets, self.page_table)),
            page_table=self.page_table,
        )

    def gather(self, layer: int) -> tuple[jax.Array, jax.Array]:
        """Dequantized (B, KVH, NP*page_s, D) logical views (XLA fallback)."""
        from .kv_cache import QuantKV
        kq = _gather_paged(self.k_q[layer], self.page_table)
        vq = _gather_paged(self.v_q[layer], self.page_table)
        ks = _gather_paged_scale(self.k_s[layer], self.page_table)
        vs = _gather_paged_scale(self.v_s[layer], self.page_table)
        return (QuantKV.dequantize(kq, ks), QuantKV.dequantize(vq, vs))


def _write_paged_scale(pool: jax.Array, new: jax.Array, offsets: jax.Array,
                       pt: jax.Array) -> jax.Array:
    """pool (P, KVH, page_s) <- new (B, T, KVH) scales, same routing as
    :func:`_write_paged`."""
    P, KVH, page_s = pool.shape
    B, T = new.shape[0], new.shape[1]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    lp = jnp.clip(pos // page_s, 0, pt.shape[1] - 1)
    phys = jnp.take_along_axis(pt, lp, axis=1)
    within = pos % page_s
    phys = jnp.where(phys < 0, P, phys)
    upd = new.reshape(B * T, KVH)
    return pool.at[phys.reshape(-1), :, within.reshape(-1)].set(
        upd.astype(pool.dtype), mode="drop")


def _gather_paged_scale(pool: jax.Array, pt: jax.Array) -> jax.Array:
    """(B, KVH, NP*page_s) logical scale view (XLA fallback only)."""
    P, KVH, page_s = pool.shape
    B, NP = pt.shape
    g = pool[jnp.clip(pt, 0, P - 1)]          # (B, NP, KVH, page_s)
    return g.transpose(0, 2, 1, 3).reshape(B, KVH, NP * page_s)


class PageAllocator:
    """Host-side free-list allocator for the physical pool.

    The engine reserves a slot's pages up front (prompt + max_tokens) and
    frees them when the request leaves its slot; the device table is
    rebuilt from the host mirror only on admission/release (never in the
    decode hot loop)."""

    def __init__(self, pool_pages: int, batch: int):
        import numpy as np

        self.page_s_free = list(range(pool_pages - 1, -1, -1))
        self.table = np.full((batch, pool_pages), -1, dtype="int32")
        self.owned: dict[int, list[int]] = {b: [] for b in range(batch)}

    @property
    def free_pages(self) -> int:
        return len(self.page_s_free)

    def reserve(self, b: int, n_pages: int) -> bool:
        """Extend slot b's mapping by ``n_pages``; False if pool exhausted
        (nothing allocated on failure)."""
        if n_pages > len(self.page_s_free):
            return False
        start = len(self.owned[b])
        for j in range(n_pages):
            pg = self.page_s_free.pop()
            self.owned[b].append(pg)
            self.table[b, start + j] = pg
        return True

    def release(self, b: int) -> None:
        for pg in self.owned[b]:
            self.page_s_free.append(pg)
        self.owned[b] = []
        self.table[b, :] = -1
