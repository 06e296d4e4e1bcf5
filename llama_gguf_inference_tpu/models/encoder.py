"""BERT-family encoder graph: the embedding/reranking model side of
llama-server.

The reference serves embedding GGUFs (bert / nomic-bert, e.g.
nomic-embed-text) through llama-server's ``--embedding`` mode and exposes
them on ``/v1/embeddings`` via the verbatim proxy
(reference ``scripts/gateway.py:807``); llama.cpp's ``llm_build_bert``
defines the graph and ``convert_hf_to_gguf.py::BertModel`` the tensor/key
names followed here.

TPU-first design: the whole encoder is ONE jitted call over a padded
bucket — bidirectional attention is a plain (B, T, T) masked softmax over
MXU dots (no KV cache, no scan), the padding mask rides ``lengths``, and
mean pooling + L2 normalization happen in-graph so a request costs exactly
one dispatch on the axon relay.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ..ops.linear import matmul

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    arch: str = "bert"
    vocab_size: int = 30522
    dim: int = 384
    n_layers: int = 6
    n_heads: int = 12
    head_dim: int = 32
    ffn_dim: int = 1536
    ln_eps: float = 1e-12
    max_positions: int = 512
    n_token_types: int = 2
    pooling: str = "mean"            # "mean" | "cls" (llama.cpp pooling_type)

    @staticmethod
    def from_gguf_metadata(md: Mapping[str, Any]) -> "EncoderConfig":
        arch = str(md.get("general.architecture", "bert"))

        def k(suffix, default=None):
            return md.get(f"{arch}.{suffix}", default)

        dim = int(k("embedding_length"))
        n_heads = int(k("attention.head_count"))
        # llama.cpp pooling_type: 0 none, 1 mean, 2 cls.  Type 0 returns
        # per-token embeddings in llama-server — a different response shape
        # than the pooled vector this engine serves; reject rather than
        # silently alias it to mean (which would diverge numerically).
        ptype = int(k("pooling_type", 1))
        if ptype == 0:
            raise ValueError(
                "pooling_type 0 (none) requests per-token embeddings, "
                "which this engine does not serve; re-export the GGUF "
                "with mean (1) or cls (2) pooling")
        pooling = {1: "mean", 2: "cls"}[ptype]
        vocab = int(k("vocab_size", 0))
        if not vocab:
            vocab = len(md.get("tokenizer.ggml.tokens", ())) or 30522
        return EncoderConfig(
            arch=arch,
            vocab_size=vocab,
            dim=dim,
            n_layers=int(k("block_count")),
            n_heads=n_heads,
            head_dim=dim // n_heads,
            ffn_dim=int(k("feed_forward_length")),
            ln_eps=float(k("attention.layer_norm_epsilon", 1e-12)),
            max_positions=int(k("context_length", 512)),
            pooling=pooling,
        )


def _ln(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _linear(layer: Params, name: str, x: jax.Array) -> jax.Array:
    y = matmul(layer[name], x)
    bias = layer.get(name + "_bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def encoder_forward(params: Params, cfg: EncoderConfig, tokens: jax.Array,
                    lengths: jax.Array) -> jax.Array:
    """tokens (B, T) int32 padded; lengths (B,) valid counts.

    Returns L2-normalized pooled embeddings (B, dim) f32 — llama-server's
    default ``--embd-normalize 2``.
    """
    B, T = tokens.shape
    H, hd = cfg.n_heads, cfg.head_dim

    x = jnp.take(params["tok_embd"], tokens, axis=0)          # (B, T, D)
    x = x + params["pos_embd"][None, :T]
    x = x + params["type_embd"][None, None, 0]                # all type 0
    x = _ln(x, params["embd_norm"], params["embd_norm_bias"], cfg.ln_eps)

    valid = jnp.arange(T)[None, :] < lengths[:, None]         # (B, T)
    # bidirectional attention restricted to valid (non-pad) key positions
    attn_bias = jnp.where(valid[:, None, None, :], 0.0, -1e30)  # (B,1,1,T)

    for layer in params["layers"]:
        q = _linear(layer, "attn_q", x).reshape(B, T, H, hd)
        k = _linear(layer, "attn_k", x).reshape(B, T, H, hd)
        v = _linear(layer, "attn_v", x).reshape(B, T, H, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / jnp.sqrt(float(hd))
        probs = jax.nn.softmax(scores + attn_bias, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", probs,
                         v.astype(jnp.float32)).reshape(B, T, H * hd)
        attn_out = _linear(layer, "attn_output", ctx.astype(x.dtype))
        x = _ln(x + attn_out, layer["attn_output_norm"],
                layer["attn_output_norm_bias"], cfg.ln_eps)
        up = _linear(layer, "ffn_up", x)
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=False)
        ffn_out = _linear(layer, "ffn_down", act.astype(x.dtype))
        x = _ln(x + ffn_out, layer["layer_output_norm"],
                layer["layer_output_norm_bias"], cfg.ln_eps)

    xf = x.astype(jnp.float32)
    if cfg.pooling == "cls":
        pooled = xf[:, 0]
    else:
        m = valid[:, :, None].astype(jnp.float32)
        pooled = jnp.sum(xf * m, axis=1) / jnp.maximum(
            lengths[:, None].astype(jnp.float32), 1.0)
    norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)
