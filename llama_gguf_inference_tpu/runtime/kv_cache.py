"""KV cache variants: bf16 and q8_0-quantized.

The reference exposes llama.cpp's quantized KV cache through backend flags
(SURVEY.md §2.9/§5.7 — ``EXTRA_ARGS="--cache-type-k q8_0 ..."``).  The TPU
version stores int8 codes + per-32-element f32 scales (same block granularity
as llama.cpp's q8_0 KV), halving cache HBM traffic for long contexts.

Both variants expose the same functional surface used by the model graph:

    cache.layer(i) -> per-layer view with .k_full() / .v_full() (bf16 dequant)
    cache.write(i, k, v, offsets) -> new cache (pure update)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig

KV_BLOCK = 32


def kv_block_for(head_dim: int) -> int:
    """q8_0-style block size: 32 when possible (llama.cpp granularity),
    smaller power-of-two fallback for tiny test heads."""
    for blk in (32, 16, 8, 4):
        if head_dim % blk == 0:
            return blk
    return head_dim


def _write_at_offsets(buf: jax.Array, new: jax.Array, offsets: jax.Array) -> jax.Array:
    """buf (B, S, ...) <- new (B, T, ...) at per-sequence offsets (B,)."""

    def one(c, n, off):
        idx = (off,) + (0,) * (c.ndim - 1)
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), idx)

    return jax.vmap(one)(buf, new, offsets)


class QuantKV(NamedTuple):
    """q8_0 KV per layer: codes (B, S, H, D) int8, scales (B, S, H, D//32)
    f32 — L-tuples (per-layer arrays keep updates in-place; see KVCache)."""

    k_q: tuple
    k_s: tuple
    v_q: tuple
    v_s: tuple

    @staticmethod
    def zeros(cfg: ModelConfig, batch: int, max_seq: int) -> "QuantKV":
        L, H, D = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
        blk = kv_block_for(D)
        qshape = (batch, max_seq, H, D)
        sshape = (batch, max_seq, H, D // blk)
        return QuantKV(
            k_q=tuple(jnp.zeros(qshape, jnp.int8) for _ in range(L)),
            k_s=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(L)),
            v_q=tuple(jnp.zeros(qshape, jnp.int8) for _ in range(L)),
            v_s=tuple(jnp.zeros(sshape, jnp.float32) for _ in range(L)),
        )

    # -- codec ---------------------------------------------------------------
    @staticmethod
    def quantize(x: jax.Array, blk: int | None = None) -> tuple[jax.Array, jax.Array]:
        """x (..., D) f32/bf16 -> (codes int8, scales f32 per block)."""
        shp = x.shape
        if blk is None:
            blk = kv_block_for(shp[-1])
        xb = x.astype(jnp.float32).reshape(*shp[:-1], shp[-1] // blk, blk)
        amax = jnp.max(jnp.abs(xb), axis=-1)
        s = amax / 127.0
        inv = jnp.where(s > 0, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
        q = jnp.clip(jnp.round(xb * inv[..., None]), -127, 127).astype(jnp.int8)
        return q.reshape(shp), s

    @staticmethod
    def dequantize(q: jax.Array, s: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
        shp = q.shape
        blk = shp[-1] // s.shape[-1]
        qb = q.astype(jnp.float32).reshape(*shp[:-1], shp[-1] // blk, blk)
        x = qb * s[..., None]
        return x.reshape(shp).astype(dtype)

    # -- model-facing API ----------------------------------------------------
    def write(self, layer: int, k: jax.Array, v: jax.Array,
              offsets: jax.Array) -> "QuantKV":
        def ts(t, v_):
            return t[:layer] + (v_,) + t[layer + 1:]

        blk = self.k_q[0].shape[-1] // self.k_s[0].shape[-1]
        kq, ks = self.quantize(k, blk)
        vq, vs = self.quantize(v, blk)
        return QuantKV(
            k_q=ts(self.k_q, _write_at_offsets(self.k_q[layer], kq, offsets)),
            k_s=ts(self.k_s, _write_at_offsets(self.k_s[layer], ks, offsets)),
            v_q=ts(self.v_q, _write_at_offsets(self.v_q[layer], vq, offsets)),
            v_s=ts(self.v_s, _write_at_offsets(self.v_s[layer], vs, offsets)),
        )

    def k_full(self, layer: int, dtype=jnp.bfloat16) -> jax.Array:
        return self.dequantize(self.k_q[layer], self.k_s[layer], dtype)

    def v_full(self, layer: int, dtype=jnp.bfloat16) -> jax.Array:
        return self.dequantize(self.v_q[layer], self.v_s[layer], dtype)

    @property
    def max_seq(self) -> int:
        return self.k_q[0].shape[1]
