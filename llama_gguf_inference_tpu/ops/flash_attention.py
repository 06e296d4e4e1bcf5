"""Pallas flash attention over the paged/offset KV cache.

Replaces the naive XLA attention in models/llama.py for TPU execution:
full (T, S) score tensors never materialize in HBM — softmax runs blockwise
in VMEM with running max/sum (the standard flash recurrence), over a KV cache
laid out (B, S, H, D).  Handles:

- GQA: query-head groups share one KV head (grid over (batch, kv_head))
- per-sequence offsets: query position t attends to cache slots
  s <= offset_b + t (causal within the chunk, everything before it)
- decode (T = 1) and chunked prefill (T up to 512) with the same kernel

The KV-quantized (q8_0) variant dequantizes KV blocks in VMEM, halving cache
HBM traffic (reference exposes this via llama.cpp's cache-type flags,
SURVEY.md §2.9 / §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(offset, q_ref, k_ref, v_ref, o_ref, *, T: int, S: int,
                 group: int, head_dim: int, blk_s: int, scale: float):
    """One (batch, kv_head) instance.

    q_ref: (group*T, D) — query heads for this kv head, rows = (g, t) pairs
    k_ref/v_ref: (S, D) — this sequence's cache for this kv head
    o_ref: (group*T, D)
    offset: this sequence's cache offset (traced scalar)
    """
    R = group * T

    q = q_ref[:].astype(jnp.float32) * scale           # (R, D)

    n_blocks = S // blk_s
    # running flash stats
    m = jnp.full((R, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((R, 1), jnp.float32)
    acc = jnp.zeros((R, head_dim), jnp.float32)

    # query position per row: row r -> t = r % T  (rows are (g, t) pairs)
    t_of_row = jax.lax.broadcasted_iota(jnp.int32, (R, blk_s), 0) % T
    s_in_blk = jax.lax.broadcasted_iota(jnp.int32, (R, blk_s), 1)

    def body(i, carry):
        m, l, acc = carry
        k_blk = k_ref[pl.ds(i * blk_s, blk_s), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(i * blk_s, blk_s), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (R, blk_s)
        s_pos = i * blk_s + s_in_blk
        mask = s_pos <= (offset + t_of_row)
        scores = jnp.where(mask, scores, _NEG_INF)

        m_new = jnp.maximum(m, scores.max(axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l * alpha + p.sum(axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _flash_attention_jit(q, k_cache, v_cache, offsets, *, cfg):
    B, T, H, D = cfg[0], cfg[1], cfg[2], cfg[3]
    S, KVH, blk_s = cfg[4], cfg[5], cfg[6]
    group = H // KVH
    scale = 1.0 / (D ** 0.5)

    # rows = (g, t): reshape q (B, T, H, D) -> (B, KVH, group*T, D)
    qr = (q.transpose(0, 2, 1, 3)                 # (B, H, T, D)
          .reshape(B, KVH, group, T, D)
          .reshape(B, KVH, group * T, D))
    # cache (B, S, KVH, D) -> (B, KVH, S, D)
    kr = k_cache.transpose(0, 2, 1, 3)
    vr = v_cache.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec((1, 1, group * T, D), lambda b, h, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda b, h, off: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, group * T, D),
                               lambda b, h, off: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(off_ref, q_ref, k_ref, v_ref, o_ref):
        b = pl.program_id(0)
        _attn_kernel(off_ref[b],
                     q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0],
                     o_ref.at[0, 0],
                     T=T, S=S, group=group, head_dim=D, blk_s=blk_s,
                     scale=scale)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, group * T, D), q.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(offsets.astype(jnp.int32), qr, kr, vr)

    # (B, KVH, group*T, D) -> (B, T, H, D)
    return (out.reshape(B, KVH, group, T, D)
            .reshape(B, H, T, D)
            .transpose(0, 2, 1, 3))


def flash_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                    offsets: jax.Array, blk_s: int = 256) -> jax.Array:
    """q: (B, T, H, D); caches: (B, S, KVH, D); offsets: (B,).

    Returns (B, T, H, D).  Query position t of sequence b attends to cache
    slots s <= offsets[b] + t.
    """
    B, T, H, D = q.shape
    S, KVH = k_cache.shape[1], k_cache.shape[2]
    blk_s = min(blk_s, S)
    if S % blk_s:
        raise ValueError(f"S={S} not divisible by block {blk_s}")
    cfg = (B, T, H, D, S, KVH, blk_s)
    return _flash_attention_jit(q, k_cache, v_cache, offsets, cfg=cfg)
