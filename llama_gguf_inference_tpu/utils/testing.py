"""Synthetic GGUF model factories.

The environment (like the reference's CI, which runs ``MOCK_BACKEND=true`` —
reference ``.github/workflows/ci.yml:185-228``) has no model weights; tests
and benches synthesize spec-compliant GGUF files instead.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType, Keys, TokenType
from ..gguf.writer import GGUFWriter


def make_tiny_vocab() -> tuple[list[str], list[float], list[int]]:
    """A minimal SPM-style vocab: specials, byte fallbacks, a few words."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
        scores.append(0.0)
    words = ["▁the", "▁quick", "▁brown", "▁fox", "▁jumps", "▁over", "▁lazy",
             "▁dog", "▁hello", "▁world", "▁a", "▁of", "▁to", "▁and", "▁in",
             "he", "ll", "o", "w", "or", "ld", "▁", "s", "t", "e", "a", "i",
             "n", "r", "d", "u", "m", "th", "er", "on", "an"]
    # SPM greedy merging needs every prefix of a word present (real vocabs
    # satisfy this); synthesize the intermediate pieces with worse scores
    pieces: dict[str, float] = {}
    for rank, wd in enumerate(words):
        for plen in range(2, len(wd) + 1):
            pre = wd[:plen]
            score = -float(rank) if pre == wd else -100.0 - plen
            pieces.setdefault(pre, score)
        pieces[wd] = -float(rank)
    for wd, score in pieces.items():
        tokens.append(wd)
        types.append(TokenType.NORMAL)
        scores.append(score)
    return tokens, scores, [int(t) for t in types]


def write_tiny_llama(
    path: str | Path,
    *,
    dim: int = 64,
    n_layers: int = 2,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    ffn_dim: int = 128,
    n_experts: int = 0,
    n_experts_used: int = 0,
    context_length: int = 256,
    quant: GGMLType = GGMLType.F32,
    seed: int = 0,
    tie_output: bool = False,
    arch: str = "llama",
    sliding_window: int = 0,
) -> Path:
    """Write a small random-weight GGUF file.

    ``arch`` selects the per-architecture extras the loader/graph expect:
    qwen2 (Q/K/V biases), qwen3 (Q/K per-head norms), gemma/gemma2
    (gelu + embedding scale; gemma2 adds post-norms, softcaps, sliding
    window).  Default "llama" also covers mixtral when n_experts > 0.
    """
    rng = np.random.default_rng(seed)
    tokens, scores, types = make_tiny_vocab()
    vocab = len(tokens)
    name = "mixtral" if n_experts else arch
    # quantized tensors need in_features divisible by the block size
    head_dim = dim // n_heads

    w = GGUFWriter(path)
    w.add(Keys.ARCHITECTURE, arch)   # mixtral uses arch "llama" + expert keys in practice
    w.add(Keys.NAME, f"tiny-{name}")
    w.add(f"{arch}.context_length", context_length)
    w.add(f"{arch}.embedding_length", dim)
    w.add(f"{arch}.block_count", n_layers)
    w.add(f"{arch}.feed_forward_length", ffn_dim)
    w.add(f"{arch}.attention.head_count", n_heads)
    w.add(f"{arch}.attention.head_count_kv", n_kv_heads)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", 10000.0)
    # deepseek2 (MLA): decoupled rope dims + latent ranks; per-head cache
    # dims are (qk_nope + qk_rope, v_head_dim) instead of head_dim
    ds_rope, ds_nope, ds_v, ds_kv_lora = 8, 24, 16, 32
    if arch == "deepseek2":
        w.add("deepseek2.rope.dimension_count", ds_rope)
        w.add("deepseek2.attention.key_length", ds_nope + ds_rope)
        w.add("deepseek2.attention.value_length", ds_v)
        w.add("deepseek2.attention.kv_lora_rank", ds_kv_lora)
    else:
        w.add(f"{arch}.rope.dimension_count", head_dim)
    if arch == "gemma2":
        w.add("gemma2.attn_logit_softcapping", 50.0)
        w.add("gemma2.final_logit_softcapping", 30.0)
        w.add("gemma2.attention.sliding_window",
              sliding_window or context_length)
    elif arch == "gemma3":
        w.add("gemma3.attention.sliding_window",
              sliding_window or context_length)
        w.add("gemma3.rope.local_freq_base", 10000.0)
    elif arch == "granite":
        w.add("granite.embedding_scale", 4.0)
        w.add("granite.residual_scale", 0.5)
        w.add("granite.attention.scale", 0.125)
        w.add("granite.logit_scale", 2.0)
    elif arch == "command-r":
        w.add("command-r.logit_scale", 0.5)
    if n_experts:
        w.add(f"{arch}.expert_count", n_experts)
        w.add(f"{arch}.expert_used_count", n_experts_used or 2)
    w.add(Keys.TOKENIZER_MODEL, "llama")
    w.add(Keys.TOKENIZER_TOKENS, tokens)
    w.add(Keys.TOKENIZER_SCORES, np.asarray(scores, dtype=np.float32))
    w.add(Keys.TOKENIZER_TOKEN_TYPE, np.asarray(types, dtype=np.int32))
    w.add(Keys.TOKENIZER_BOS, 1)
    w.add(Keys.TOKENIZER_EOS, 2)
    w.add(Keys.TOKENIZER_UNK, 0)
    w.add(Keys.TOKENIZER_ADD_BOS, True)

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_tensor("token_embd.weight", rand(vocab, dim), GGMLType.F32)
    for i in range(n_layers):
        p = f"blk.{i}."
        if arch != "olmo2":   # olmo2 ships POST-norms only
            w.add_tensor(p + "attn_norm.weight", np.ones(dim, np.float32),
                         GGMLType.F32)
        if arch == "deepseek2":
            dk = ds_nope + ds_rope
            w.add_tensor(p + "attn_q.weight", rand(n_heads * dk, dim), quant)
            w.add_tensor(p + "attn_kv_a_mqa.weight",
                         rand(ds_kv_lora + ds_rope, dim), quant)
            w.add_tensor(p + "attn_kv_a_norm.weight",
                         np.ones(ds_kv_lora, np.float32), GGMLType.F32)
            w.add_tensor(p + "attn_kv_b.weight",
                         rand(n_heads * (ds_nope + ds_v), ds_kv_lora), quant)
            w.add_tensor(p + "attn_output.weight",
                         rand(dim, n_heads * ds_v), quant)
        else:
            w.add_tensor(p + "attn_q.weight", rand(n_heads * head_dim, dim), quant)
            w.add_tensor(p + "attn_k.weight", rand(n_kv_heads * head_dim, dim), quant)
            w.add_tensor(p + "attn_v.weight", rand(n_kv_heads * head_dim, dim), quant)
            w.add_tensor(p + "attn_output.weight", rand(dim, n_heads * head_dim), quant)
        if arch not in ("olmo2", "command-r"):
            # command-r: ONE shared pre-norm; olmo2: post-norms only
            w.add_tensor(p + "ffn_norm.weight", np.ones(dim, np.float32),
                         GGMLType.F32)
        if arch == "olmo2":
            w.add_tensor(p + "attn_q_norm.weight",
                         np.ones(n_heads * head_dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "attn_k_norm.weight",
                         np.ones(n_kv_heads * head_dim, np.float32),
                         GGMLType.F32)
            w.add_tensor(p + "attn_post_norm.weight",
                         np.ones(dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "ffn_post_norm.weight",
                         np.ones(dim, np.float32), GGMLType.F32)
        if arch in ("qwen2", "qwen2moe"):
            w.add_tensor(p + "attn_q.bias", rand(n_heads * head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_k.bias", rand(n_kv_heads * head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_v.bias", rand(n_kv_heads * head_dim), GGMLType.F32)
        elif arch in ("qwen3", "qwen3moe"):
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32), GGMLType.F32)
        elif arch == "gemma2":
            w.add_tensor(p + "attn_post_norm.weight", np.ones(dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "ffn_post_norm.weight", np.ones(dim, np.float32), GGMLType.F32)
        elif arch == "gemma3":
            w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "attn_post_norm.weight", np.ones(dim, np.float32), GGMLType.F32)
            w.add_tensor(p + "ffn_post_norm.weight", np.ones(dim, np.float32), GGMLType.F32)
        elif arch == "starcoder2":
            w.add_tensor(p + "attn_norm.bias", rand(dim), GGMLType.F32)
            w.add_tensor(p + "ffn_norm.bias", rand(dim), GGMLType.F32)
            w.add_tensor(p + "attn_q.bias", rand(n_heads * head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_k.bias", rand(n_kv_heads * head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_v.bias", rand(n_kv_heads * head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_output.bias", rand(dim), GGMLType.F32)
            w.add_tensor(p + "ffn_up.bias", rand(ffn_dim), GGMLType.F32)
            w.add_tensor(p + "ffn_down.bias", rand(dim), GGMLType.F32)
        if n_experts:
            w.add_tensor(p + "ffn_gate_inp.weight", rand(n_experts, dim), GGMLType.F32)
            w.add_tensor(p + "ffn_gate_exps.weight", rand(n_experts, ffn_dim, dim), quant)
            w.add_tensor(p + "ffn_up_exps.weight", rand(n_experts, ffn_dim, dim), quant)
            w.add_tensor(p + "ffn_down_exps.weight", rand(n_experts, dim, ffn_dim), quant)
            if arch == "qwen2moe":   # sigmoid-gated always-on shared expert
                w.add_tensor(p + "ffn_gate_shexp.weight", rand(ffn_dim, dim), quant)
                w.add_tensor(p + "ffn_up_shexp.weight", rand(ffn_dim, dim), quant)
                w.add_tensor(p + "ffn_down_shexp.weight", rand(dim, ffn_dim), quant)
                w.add_tensor(p + "ffn_gate_inp_shexp.weight", rand(1, dim), GGMLType.F32)
        elif arch == "starcoder2":   # plain MLP: no gate tensor
            w.add_tensor(p + "ffn_up.weight", rand(ffn_dim, dim), quant)
            w.add_tensor(p + "ffn_down.weight", rand(dim, ffn_dim), quant)
        else:
            w.add_tensor(p + "ffn_gate.weight", rand(ffn_dim, dim), quant)
            w.add_tensor(p + "ffn_up.weight", rand(ffn_dim, dim), quant)
            w.add_tensor(p + "ffn_down.weight", rand(dim, ffn_dim), quant)
    w.add_tensor("output_norm.weight", np.ones(dim, np.float32), GGMLType.F32)
    if arch == "starcoder2":
        w.add_tensor("output_norm.bias", rand(dim), GGMLType.F32)
    if not tie_output:
        w.add_tensor("output.weight", rand(vocab, dim), quant)
    return w.write()
