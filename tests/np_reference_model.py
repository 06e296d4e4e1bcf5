"""Independent pure-numpy Llama forward used to cross-check the JAX graph.

Deliberately written as a separate implementation (f32, loop-per-layer,
no shared helper code with models/llama.py) so transposition/RoPE/masking bugs
can't cancel out between implementations.
"""

import numpy as np


def rms_norm(x, w, eps):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def rope_interleaved(x, pos, base, rope_dim):
    # x: (T, H, hd); rotate pairs (2i, 2i+1) of the first rope_dim dims
    T, H, hd = x.shape
    half = rope_dim // 2
    inv = base ** (-np.arange(half) / half)
    ang = pos[:, None] * inv[None, :]           # (T, half)
    cos, sin = np.cos(ang), np.sin(ang)
    out = x.copy()
    x0 = x[..., 0:2 * half:2]
    x1 = x[..., 1:2 * half:2]
    out[..., 0:2 * half:2] = x0 * cos[:, None, :] - x1 * sin[:, None, :]
    out[..., 1:2 * half:2] = x0 * sin[:, None, :] + x1 * cos[:, None, :]
    return out


def forward_np(weights, cfg, ids):
    """weights: dict of f32 numpy arrays keyed by GGUF tensor names.
    ids: (T,) int. Returns logits (T, vocab)."""
    H, KVH, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = weights["token_embd.weight"][ids]       # (T, D)
    T = x.shape[0]
    pos = np.arange(T, dtype=np.float64)
    causal = np.tril(np.ones((T, T), dtype=bool))
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        h = rms_norm(x, weights[p + "attn_norm.weight"], cfg.rms_eps)
        q = (h @ weights[p + "attn_q.weight"].T).reshape(T, H, hd)
        k = (h @ weights[p + "attn_k.weight"].T).reshape(T, KVH, hd)
        v = (h @ weights[p + "attn_v.weight"].T).reshape(T, KVH, hd)
        q = rope_interleaved(q, pos, cfg.rope_base, cfg.rope_dim)
        k = rope_interleaved(k, pos, cfg.rope_base, cfg.rope_dim)
        group = H // KVH
        ctx = np.empty((T, H, hd), dtype=x.dtype)
        for hh in range(H):
            kv = hh // group
            scores = (q[:, hh] @ k[:, kv].T) / np.sqrt(hd)
            scores = np.where(causal, scores, -np.inf)
            m = scores.max(-1, keepdims=True)
            e = np.exp(scores - m)
            probs = e / e.sum(-1, keepdims=True)
            ctx[:, hh] = probs @ v[:, kv]
        x = x + ctx.reshape(T, H * hd) @ weights[p + "attn_output.weight"].T
        h = rms_norm(x, weights[p + "ffn_norm.weight"], cfg.rms_eps)
        gate = h @ weights[p + "ffn_gate.weight"].T
        up = h @ weights[p + "ffn_up.weight"].T
        act = gate / (1.0 + np.exp(-gate)) * up
        x = x + act @ weights[p + "ffn_down.weight"].T
    x = rms_norm(x, weights["output_norm.weight"], cfg.rms_eps)
    out_w = weights.get("output.weight", weights["token_embd.weight"])
    return x @ out_w.T
