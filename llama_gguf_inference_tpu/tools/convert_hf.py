"""Convert a Hugging Face Llama checkpoint to GGUF — the llama.cpp
``convert_hf_to_gguf.py`` counterpart.

Reads a local HF directory (config.json + weights via transformers), maps
tensors to GGUF names, applies the Q/K rope permutation (HF stores weights
for half-split rope; GGUF's "norm" rope expects the llama.cpp permuted
layout), and embeds the tokenizer from tokenizer.json (BPE vocab+merges).

Usage:
    python -m llama_gguf_inference_tpu.tools.convert_hf /path/to/hf_dir out.gguf \
        [--dtype f16|f32|bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..gguf.constants import GGMLType, Keys
from ..gguf.writer import GGUFWriter


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """llama.cpp convert permutation: half-split rope -> interleaved rope."""
    out_f = w.shape[0]
    return (w.reshape(n_head, 2, out_f // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2)
            .reshape(w.shape))


def _dtype_for(name: str, arg: str) -> GGMLType:
    if name.endswith("_norm.weight") or name.endswith("norm.weight"):
        return GGMLType.F32
    return {"f16": GGMLType.F16, "f32": GGMLType.F32,
            "bf16": GGMLType.BF16}[arg]


def load_state_dict(hf_dir: str) -> dict[str, np.ndarray]:
    """Weights via safetensors files or torch bins (cpu)."""
    st_files = [f for f in os.listdir(hf_dir) if f.endswith(".safetensors")]
    out: dict[str, np.ndarray] = {}
    if st_files:
        from safetensors import safe_open  # ships with transformers images

        for f in sorted(st_files):
            with safe_open(os.path.join(hf_dir, f), framework="np") as sf:
                for k in sf.keys():
                    out[k] = np.asarray(sf.get_tensor(k))
        return out
    import torch

    bins = [f for f in os.listdir(hf_dir)
            if f.startswith("pytorch_model") and f.endswith(".bin")]
    for f in sorted(bins):
        sd = torch.load(os.path.join(hf_dir, f), map_location="cpu",
                        weights_only=True)
        for k, v in sd.items():
            out[k] = v.to(torch.float32).numpy()
    if not out:
        raise SystemExit(f"no weights found in {hf_dir}")
    return out


def tokenizer_metadata(hf_dir: str) -> dict:
    """Extract BPE vocab/merges from tokenizer.json when present."""
    tj = os.path.join(hf_dir, "tokenizer.json")
    if not os.path.exists(tj):
        return {}
    data = json.load(open(tj, encoding="utf-8"))
    model = data.get("model", {})
    if model.get("type") != "BPE":
        return {}
    vocab: dict[str, int] = model["vocab"]
    tokens = [""] * len(vocab)
    for tok, idx in vocab.items():
        if idx < len(tokens):
            tokens[idx] = tok
    merges = model.get("merges", [])
    merges = [" ".join(m) if isinstance(m, list) else m for m in merges]
    added = {a["id"]: a for a in data.get("added_tokens", [])}
    # extend for added tokens beyond base vocab
    max_id = max([len(tokens) - 1] + list(added))
    while len(tokens) <= max_id:
        tokens.append("")
    types = [1] * len(tokens)
    for i, a in added.items():
        tokens[i] = a["content"]
        types[i] = 3 if a.get("special") else 4
    return {
        Keys.TOKENIZER_MODEL: "gpt2",
        Keys.TOKENIZER_TOKENS: tokens,
        Keys.TOKENIZER_MERGES: merges,
        Keys.TOKENIZER_TOKEN_TYPE: np.asarray(types, np.int32),
    }


# HF model_type -> GGUF architecture (llama.cpp convert_hf_to_gguf naming)
# mixtral maps to arch "llama" + expert keys/tensors, matching llama.cpp's
# MixtralForCausalLM -> LlamaModel conversion (real mixtral GGUFs carry
# general.architecture == "llama")
_ARCH_MAP = {"llama": "llama", "mistral": "llama", "mixtral": "llama",
             "qwen2": "qwen2", "qwen3": "qwen3", "qwen2_moe": "qwen2moe",
             "qwen3_moe": "qwen3moe", "gemma": "gemma", "gemma2": "gemma2",
             "gemma3": "gemma3", "gemma3_text": "gemma3",
             "phi3": "phi3", "starcoder2": "starcoder2",
             "deepseek_v2": "deepseek2", "deepseek_v3": "deepseek2",
             "granite": "granite", "cohere": "command-r", "olmo2": "olmo2"}

# routed-MoE model types exported through the generic layer loop (deepseek2
# has its own branch); llama.cpp names: blk.N.ffn_{gate,up,down}_exps stacked
_MOE_TYPES = ("mixtral", "qwen2_moe", "qwen3_moe")


def _convert_bert(hf_dir: str, dst: str, cfg: dict, dtype: str,
                  verbose: bool) -> None:
    """BERT-family encoder export (llama.cpp convert_hf_to_gguf BertModel):
    embedding tables + per-block biased projections and LayerNorms, plus a
    WordPiece tokenizer from vocab.txt."""
    sd = load_state_dict(hf_dir)

    def get(name):
        for cand in (name, "bert." + name):
            if cand in sd:
                return sd[cand].astype(np.float32)
        raise SystemExit(f"missing tensor {name}")

    dim = cfg["hidden_size"]
    n_layers = cfg["num_hidden_layers"]
    w = GGUFWriter(dst)
    w.add(Keys.ARCHITECTURE, "bert")
    w.add(Keys.NAME, os.path.basename(os.path.normpath(hf_dir)))
    w.add("bert.context_length", int(cfg.get("max_position_embeddings", 512)))
    w.add("bert.embedding_length", dim)
    w.add("bert.block_count", n_layers)
    w.add("bert.feed_forward_length", int(cfg["intermediate_size"]))
    w.add("bert.attention.head_count", int(cfg["num_attention_heads"]))
    w.add("bert.attention.layer_norm_epsilon",
          float(cfg.get("layer_norm_eps", 1e-12)))
    w.add("bert.vocab_size", int(cfg["vocab_size"]))
    w.add("bert.attention.causal", False)
    w.add("bert.pooling_type", 1)   # mean (llama.cpp LLAMA_POOLING_TYPE_MEAN)

    vocab_path = os.path.join(hf_dir, "vocab.txt")
    if not os.path.exists(vocab_path):
        raise SystemExit(f"bert conversion needs {vocab_path} (WordPiece)")
    tokens = [line.rstrip("\n") for line in
              open(vocab_path, encoding="utf-8")]
    types = [3 if t.startswith("[") and t.endswith("]") else 1
             for t in tokens]
    idx = {t: i for i, t in enumerate(tokens)}
    w.add(Keys.TOKENIZER_MODEL, "bert")
    w.add(Keys.TOKENIZER_TOKENS, tokens)
    w.add(Keys.TOKENIZER_TOKEN_TYPE, np.asarray(types, np.int32))
    w.add("tokenizer.ggml.cls_token_id", idx.get("[CLS]", 0))
    w.add("tokenizer.ggml.seperator_token_id", idx.get("[SEP]", 0))
    w.add(Keys.TOKENIZER_UNK, idx.get("[UNK]", 0))
    w.add(Keys.TOKENIZER_PAD, idx.get("[PAD]", 0))
    w.add(Keys.TOKENIZER_ADD_BOS, True)
    w.add(Keys.TOKENIZER_ADD_EOS, True)

    def put(name, data):
        t = GGMLType.F32 if (name.endswith(".bias") or "norm" in name
                             or data.ndim == 1) else _dtype_for(name, dtype)
        w.add_tensor(name, data, t)
        if verbose:
            print(f"  {name} {tuple(data.shape)} -> {t.name}",
                  file=sys.stderr)

    put("token_embd.weight", get("embeddings.word_embeddings.weight"))
    put("position_embd.weight", get("embeddings.position_embeddings.weight"))
    put("token_types.weight", get("embeddings.token_type_embeddings.weight"))
    put("token_embd_norm.weight", get("embeddings.LayerNorm.weight"))
    put("token_embd_norm.bias", get("embeddings.LayerNorm.bias"))
    for i in range(n_layers):
        p, g = f"encoder.layer.{i}.", f"blk.{i}."
        for gg, hf in (("attn_q", "attention.self.query"),
                       ("attn_k", "attention.self.key"),
                       ("attn_v", "attention.self.value"),
                       ("attn_output", "attention.output.dense"),
                       ("ffn_up", "intermediate.dense"),
                       ("ffn_down", "output.dense")):
            put(g + gg + ".weight", get(p + hf + ".weight"))
            put(g + gg + ".bias", get(p + hf + ".bias"))
        put(g + "attn_output_norm.weight",
            get(p + "attention.output.LayerNorm.weight"))
        put(g + "attn_output_norm.bias",
            get(p + "attention.output.LayerNorm.bias"))
        put(g + "layer_output_norm.weight", get(p + "output.LayerNorm.weight"))
        put(g + "layer_output_norm.bias", get(p + "output.LayerNorm.bias"))
    w.write()


def convert(hf_dir: str, dst: str, dtype: str = "f16",
            verbose: bool = True) -> None:
    cfg = json.load(open(os.path.join(hf_dir, "config.json")))
    model_type = cfg.get("model_type", "llama")
    if model_type == "bert":
        return _convert_bert(hf_dir, dst, cfg, dtype, verbose)
    arch = _ARCH_MAP.get(model_type)
    if arch is None:
        raise SystemExit(f"unsupported model_type {model_type!r}")
    if model_type == "cohere" and cfg.get("use_qk_norm"):
        # Cohere's use_qk_norm variants carry per-head q_norm/k_norm
        # LayerNorms that this converter does not export (and the engine
        # would apply RMSNorm where cohere needs LayerNorm) — a silent drop
        # produces a GGUF that loads fine but yields wrong logits.
        raise SystemExit("cohere models with use_qk_norm=True are not "
                         "supported by this converter")
    gemma = arch in ("gemma", "gemma2", "gemma3")
    # "norm"-rope arches store Q/K permuted for interleaved pairs;
    # neox arches (qwen*/gemma*/olmo2) keep the HF layout (models.config).
    # command-r is "norm"-rope but HF cohere ALREADY rotates interleaved
    # pairs (repeat_interleave'd angles), so its weights ship unpermuted.
    permute = arch in ("llama", "granite")
    n_layers = cfg["num_hidden_layers"]
    n_head = cfg["num_attention_heads"]
    n_kv = cfg.get("num_key_value_heads", n_head)
    dim = cfg["hidden_size"]
    # some configs (mixtral) serialize an explicit "head_dim": null
    head_dim = cfg.get("head_dim") or dim // n_head
    rope_dim_count = head_dim
    if arch == "deepseek2":   # MLA: decoupled rope dims; kv cache per head
        head_dim = int(cfg["qk_nope_head_dim"]) + int(cfg["qk_rope_head_dim"])
        rope_dim_count = int(cfg["qk_rope_head_dim"])
        n_kv = n_head          # expanded-KV semantics (see models.llama)

    sd = load_state_dict(hf_dir)

    def get(name):
        for cand in (name, "model." + name):
            if cand in sd:
                return sd[cand].astype(np.float32)
        raise SystemExit(f"missing tensor {name}")

    def get_norm(name):
        # upstream gemma converters bake the (1 + w) RMSNorm offset into
        # the stored weight, so real GGUF files never need a runtime offset
        v = get(name)
        return v + 1.0 if gemma else v

    w = GGUFWriter(dst)
    w.add(Keys.ARCHITECTURE, arch)
    w.add(Keys.NAME, os.path.basename(os.path.normpath(hf_dir)))
    w.add(f"{arch}.context_length", cfg.get("max_position_embeddings", 4096))
    w.add(f"{arch}.embedding_length", dim)
    w.add(f"{arch}.block_count", n_layers)
    w.add(f"{arch}.feed_forward_length", cfg["intermediate_size"])
    w.add(f"{arch}.attention.head_count", n_head)
    w.add(f"{arch}.attention.head_count_kv", n_kv)
    if arch in ("starcoder2", "command-r"):
        w.add(f"{arch}.attention.layer_norm_epsilon",
              cfg.get("norm_epsilon", cfg.get("layer_norm_eps", 1e-5)))
    else:
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              cfg.get("rms_norm_eps", 1e-5))
    w.add(f"{arch}.rope.freq_base", float(cfg.get("rope_theta", 10000.0)))
    w.add(f"{arch}.rope.dimension_count", rope_dim_count)
    w.add(f"{arch}.vocab_size", cfg["vocab_size"])
    if head_dim != dim // n_head and arch != "deepseek2":
        w.add(f"{arch}.attention.key_length", head_dim)
        w.add(f"{arch}.attention.value_length", head_dim)
    if model_type in _MOE_TYPES:
        # llama.cpp MoE keys (llm_load_hparams): expert counts + per-expert
        # ffn width; qwen2moe adds the shared expert's width.  Router
        # renormalization: mixtral always renorms (HF MixtralSparseMoeBlock);
        # qwen carries norm_topk_prob explicitly.
        n_exp = int(cfg.get("num_local_experts", cfg.get("num_experts", 0)))
        w.add(f"{arch}.expert_count", n_exp)
        w.add(f"{arch}.expert_used_count",
              int(cfg.get("num_experts_per_tok", 2)))
        if model_type != "mixtral":
            w.add(f"{arch}.expert_feed_forward_length",
                  int(cfg["moe_intermediate_size"]))
            w.add(f"{arch}.expert_weights_norm",
                  bool(cfg.get("norm_topk_prob", arch == "qwen3moe")))
        if arch == "qwen2moe":
            w.add("qwen2moe.expert_shared_feed_forward_length",
                  int(cfg.get("shared_expert_intermediate_size", 0)))
    if arch == "gemma2":
        w.add("gemma2.attn_logit_softcapping",
              float(cfg.get("attn_logit_softcapping", 50.0)))
        w.add("gemma2.final_logit_softcapping",
              float(cfg.get("final_logit_softcapping", 30.0)))
        w.add("gemma2.attention.sliding_window",
              int(cfg.get("sliding_window", 4096)))
    if arch == "deepseek2":
        # MLA + DeepSeekMoE hyper-parameters (llama.cpp key names)
        w.add("deepseek2.attention.key_length", head_dim)
        w.add("deepseek2.attention.value_length", int(cfg["v_head_dim"]))
        if cfg.get("q_lora_rank"):
            w.add("deepseek2.attention.q_lora_rank", int(cfg["q_lora_rank"]))
        w.add("deepseek2.attention.kv_lora_rank", int(cfg["kv_lora_rank"]))
        if cfg.get("n_routed_experts"):
            w.add("deepseek2.expert_count", int(cfg["n_routed_experts"]))
            w.add("deepseek2.expert_used_count",
                  int(cfg["num_experts_per_tok"]))
            w.add("deepseek2.expert_shared_count",
                  int(cfg.get("n_shared_experts", 0)))
            w.add("deepseek2.expert_weights_scale",
                  float(cfg.get("routed_scaling_factor", 1.0)))
            w.add("deepseek2.expert_weights_norm",
                  bool(cfg.get("norm_topk_prob", False)))
            w.add("deepseek2.leading_dense_block_count",
                  int(cfg.get("first_k_dense_replace", 0)))
            w.add("deepseek2.expert_feed_forward_length",
                  int(cfg.get("moe_intermediate_size", 0)))
            if cfg.get("topk_method") == "group_limited_greedy":
                w.add("deepseek2.expert_group_count", int(cfg["n_group"]))
                w.add("deepseek2.expert_group_used_count",
                      int(cfg["topk_group"]))
    if arch == "granite":
        # 4 scalar multipliers (HF GraniteConfig -> llama.cpp key names)
        w.add("granite.embedding_scale",
              float(cfg.get("embedding_multiplier", 1.0)))
        w.add("granite.residual_scale",
              float(cfg.get("residual_multiplier", 1.0)))
        w.add("granite.attention.scale",
              float(cfg.get("attention_multiplier", 0.0)))
        w.add("granite.logit_scale", float(cfg.get("logits_scaling", 1.0)))
    if arch == "command-r":
        w.add("command-r.logit_scale", float(cfg.get("logit_scale", 1.0)))
    if arch == "gemma3":
        w.add("gemma3.attention.sliding_window",
              int(cfg.get("sliding_window", 1024)))
        w.add("gemma3.rope.local_freq_base",
              float(cfg.get("rope_local_base_freq", 10000.0)))
        # scores scale by 1/sqrt(query_pre_attn_scalar); it CANNOT fold
        # into Q weights (gemma3's q_norm is scale-invariant), so record
        # it when it differs from head_dim (all released gemma3 sizes use
        # scalar == head_dim == 256 — real files take the default)
        scalar = float(cfg.get("query_pre_attn_scalar", head_dim))
        if scalar != head_dim:
            w.add("gemma3.attention.query_pre_attn_scalar", scalar)
    rope_scaling = cfg.get("rope_scaling") or {}
    rs_type = rope_scaling.get("rope_type") or rope_scaling.get("type")
    if arch == "gemma3" and rs_type == "linear":
        # gemma3 long-context: linear factor on GLOBAL layers only
        w.add("gemma3.rope.scaling.type", "linear")
        w.add("gemma3.rope.scaling.factor", float(rope_scaling["factor"]))
    if arch == "deepseek2" and rs_type == "yarn":
        w.add("deepseek2.rope.scaling.type", "yarn")
        w.add("deepseek2.rope.scaling.factor", float(rope_scaling["factor"]))
        w.add("deepseek2.rope.scaling.original_context_length",
              int(rope_scaling.get("original_max_position_embeddings",
                                   cfg.get("max_position_embeddings", 4096))))
        # released checkpoints use mscale == mscale_all_dim (the cos/sin
        # correction cancels); record the score-scale multiplier
        msa = float(rope_scaling.get("mscale_all_dim", 0.0))
        ms = float(rope_scaling.get("mscale", msa))
        if ms != msa:
            print(f"warning: yarn mscale {ms} != mscale_all_dim {msa}; "
                  "assuming equal (cos/sin correction not representable "
                  "in GGUF metadata)", file=sys.stderr)
        w.add("deepseek2.rope.scaling.yarn_log_multiplier", 0.1 * msa)
    if arch == "phi3":
        if cfg.get("sliding_window"):
            w.add("phi3.attention.sliding_window", int(cfg["sliding_window"]))
        if rs_type == "longrope":
            orig = int(cfg.get("original_max_position_embeddings",
                               cfg.get("max_position_embeddings", 4096)))
            w.add("phi3.rope.scaling.type", "longrope")
            w.add("phi3.rope.scaling.original_context_length", orig)
    tok_md = tokenizer_metadata(hf_dir)
    for k, v in tok_md.items():
        w.add(k, v)
    if cfg.get("bos_token_id") is not None:
        w.add(Keys.TOKENIZER_BOS, int(cfg["bos_token_id"]))
    if cfg.get("eos_token_id") is not None:
        eos = cfg["eos_token_id"]
        w.add(Keys.TOKENIZER_EOS, int(eos[0] if isinstance(eos, list) else eos))

    def put(name, data):
        t = _dtype_for(name, dtype)
        w.add_tensor(name, data, t)
        if verbose:
            print(f"  {name} {tuple(data.shape)} -> {t.name}", file=sys.stderr)

    put("token_embd.weight", get("embed_tokens.weight"))
    if arch == "phi3" and rs_type == "longrope":
        put("rope_factors_long.weight",
            np.asarray(rope_scaling["long_factor"], np.float32))
        put("rope_factors_short.weight",
            np.asarray(rope_scaling["short_factor"], np.float32))
    if arch == "phi3":
        for i in range(n_layers):
            p, g = f"layers.{i}.", f"blk.{i}."
            put(g + "attn_norm.weight", get(p + "input_layernorm.weight"))
            put(g + "attn_qkv.weight", get(p + "self_attn.qkv_proj.weight"))
            put(g + "attn_output.weight", get(p + "self_attn.o_proj.weight"))
            put(g + "ffn_norm.weight",
                get(p + "post_attention_layernorm.weight"))
            # HF gate_up_proj is [gate; up] — matches ffn_swiglu's split
            put(g + "ffn_up.weight", get(p + "mlp.gate_up_proj.weight"))
            put(g + "ffn_down.weight", get(p + "mlp.down_proj.weight"))
        put("output_norm.weight", get("norm.weight"))
        if "lm_head.weight" in sd:
            put("output.weight", sd["lm_head.weight"].astype(np.float32))
        w.write()
        return
    if arch == "deepseek2":
        for i in range(n_layers):
            p, g = f"layers.{i}.", f"blk.{i}."
            put(g + "attn_norm.weight", get(p + "input_layernorm.weight"))
            if cfg.get("q_lora_rank"):
                put(g + "attn_q_a.weight", get(p + "self_attn.q_a_proj.weight"))
                put(g + "attn_q_a_norm.weight",
                    get(p + "self_attn.q_a_layernorm.weight"))
                put(g + "attn_q_b.weight", get(p + "self_attn.q_b_proj.weight"))
            else:
                put(g + "attn_q.weight", get(p + "self_attn.q_proj.weight"))
            put(g + "attn_kv_a_mqa.weight",
                get(p + "self_attn.kv_a_proj_with_mqa.weight"))
            put(g + "attn_kv_a_norm.weight",
                get(p + "self_attn.kv_a_layernorm.weight"))
            put(g + "attn_kv_b.weight", get(p + "self_attn.kv_b_proj.weight"))
            put(g + "attn_output.weight", get(p + "self_attn.o_proj.weight"))
            put(g + "ffn_norm.weight",
                get(p + "post_attention_layernorm.weight"))
            dense = i < int(cfg.get("first_k_dense_replace", 0)) \
                or not cfg.get("n_routed_experts")
            if dense:
                put(g + "ffn_gate.weight", get(p + "mlp.gate_proj.weight"))
                put(g + "ffn_up.weight", get(p + "mlp.up_proj.weight"))
                put(g + "ffn_down.weight", get(p + "mlp.down_proj.weight"))
            else:
                put(g + "ffn_gate_inp.weight", get(p + "mlp.gate.weight"))
                n_exp = int(cfg["n_routed_experts"])
                for kind, hf in (("gate", "gate_proj"), ("up", "up_proj"),
                                 ("down", "down_proj")):
                    stacked = np.stack([
                        get(p + f"mlp.experts.{e}.{hf}.weight")
                        for e in range(n_exp)])
                    put(g + f"ffn_{kind}_exps.weight", stacked)
                put(g + "ffn_gate_shexp.weight",
                    get(p + "mlp.shared_experts.gate_proj.weight"))
                put(g + "ffn_up_shexp.weight",
                    get(p + "mlp.shared_experts.up_proj.weight"))
                put(g + "ffn_down_shexp.weight",
                    get(p + "mlp.shared_experts.down_proj.weight"))
        put("output_norm.weight", get("norm.weight"))
        if "lm_head.weight" in sd:
            put("output.weight", sd["lm_head.weight"].astype(np.float32))
        w.write()
        return
    if arch == "command-r":
        # one bias-free LayerNorm per block feeds BOTH parallel branches;
        # embeddings are tied (HF cohere has no separate lm_head)
        for i in range(n_layers):
            p, g = f"layers.{i}.", f"blk.{i}."
            put(g + "attn_norm.weight", get(p + "input_layernorm.weight"))
            put(g + "attn_q.weight", get(p + "self_attn.q_proj.weight"))
            put(g + "attn_k.weight", get(p + "self_attn.k_proj.weight"))
            put(g + "attn_v.weight", get(p + "self_attn.v_proj.weight"))
            put(g + "attn_output.weight", get(p + "self_attn.o_proj.weight"))
            put(g + "ffn_gate.weight", get(p + "mlp.gate_proj.weight"))
            put(g + "ffn_up.weight", get(p + "mlp.up_proj.weight"))
            put(g + "ffn_down.weight", get(p + "mlp.down_proj.weight"))
        put("output_norm.weight", get("norm.weight"))
        if "lm_head.weight" in sd:
            put("output.weight", sd["lm_head.weight"].astype(np.float32))
        w.write()
        return
    if arch == "olmo2":
        # POST-norms only (post_attention/post_feedforward), plus FLAT
        # q/k RMSNorms (over H*hd, applied before the head reshape)
        for i in range(n_layers):
            p, g = f"layers.{i}.", f"blk.{i}."
            put(g + "attn_q.weight", get(p + "self_attn.q_proj.weight"))
            put(g + "attn_k.weight", get(p + "self_attn.k_proj.weight"))
            put(g + "attn_v.weight", get(p + "self_attn.v_proj.weight"))
            put(g + "attn_output.weight", get(p + "self_attn.o_proj.weight"))
            put(g + "attn_q_norm.weight", get(p + "self_attn.q_norm.weight"))
            put(g + "attn_k_norm.weight", get(p + "self_attn.k_norm.weight"))
            put(g + "attn_post_norm.weight",
                get(p + "post_attention_layernorm.weight"))
            put(g + "ffn_post_norm.weight",
                get(p + "post_feedforward_layernorm.weight"))
            put(g + "ffn_gate.weight", get(p + "mlp.gate_proj.weight"))
            put(g + "ffn_up.weight", get(p + "mlp.up_proj.weight"))
            put(g + "ffn_down.weight", get(p + "mlp.down_proj.weight"))
        put("output_norm.weight", get("norm.weight"))
        if "lm_head.weight" in sd:
            put("output.weight", sd["lm_head.weight"].astype(np.float32))
        w.write()
        return
    if arch == "starcoder2":
        # LayerNorm (weight+bias) everywhere, biased projections, and a
        # plain c_fc -> gelu -> c_proj MLP (no gate)
        for i in range(n_layers):
            p, g = f"layers.{i}.", f"blk.{i}."
            put(g + "attn_norm.weight", get(p + "input_layernorm.weight"))
            put(g + "attn_norm.bias", get(p + "input_layernorm.bias"))
            put(g + "attn_q.weight", get(p + "self_attn.q_proj.weight"))
            put(g + "attn_k.weight", get(p + "self_attn.k_proj.weight"))
            put(g + "attn_v.weight", get(p + "self_attn.v_proj.weight"))
            put(g + "attn_q.bias", get(p + "self_attn.q_proj.bias"))
            put(g + "attn_k.bias", get(p + "self_attn.k_proj.bias"))
            put(g + "attn_v.bias", get(p + "self_attn.v_proj.bias"))
            put(g + "attn_output.weight", get(p + "self_attn.o_proj.weight"))
            put(g + "attn_output.bias", get(p + "self_attn.o_proj.bias"))
            put(g + "ffn_norm.weight",
                get(p + "post_attention_layernorm.weight"))
            put(g + "ffn_norm.bias", get(p + "post_attention_layernorm.bias"))
            put(g + "ffn_up.weight", get(p + "mlp.c_fc.weight"))
            put(g + "ffn_up.bias", get(p + "mlp.c_fc.bias"))
            put(g + "ffn_down.weight", get(p + "mlp.c_proj.weight"))
            put(g + "ffn_down.bias", get(p + "mlp.c_proj.bias"))
        put("output_norm.weight", get("norm.weight"))
        put("output_norm.bias", get("norm.bias"))
        if "lm_head.weight" in sd:
            put("output.weight", sd["lm_head.weight"].astype(np.float32))
        w.write()
        return
    for i in range(n_layers):
        p = f"layers.{i}."
        g = f"blk.{i}."
        put(g + "attn_norm.weight", get_norm(p + "input_layernorm.weight"))
        qw = get(p + "self_attn.q_proj.weight")
        kw = get(p + "self_attn.k_proj.weight")
        put(g + "attn_q.weight", permute_rope(qw, n_head) if permute else qw)
        put(g + "attn_k.weight", permute_rope(kw, n_kv) if permute else kw)
        put(g + "attn_v.weight", get(p + "self_attn.v_proj.weight"))
        put(g + "attn_output.weight", get(p + "self_attn.o_proj.weight"))
        if "model." + p + "self_attn.q_proj.bias" in sd \
                or p + "self_attn.q_proj.bias" in sd:   # qwen2
            put(g + "attn_q.bias", get(p + "self_attn.q_proj.bias"))
            put(g + "attn_k.bias", get(p + "self_attn.k_proj.bias"))
            put(g + "attn_v.bias", get(p + "self_attn.v_proj.bias"))
        if "model." + p + "self_attn.q_norm.weight" in sd \
                or p + "self_attn.q_norm.weight" in sd:  # qwen3 / gemma3
            put(g + "attn_q_norm.weight",
                get_norm(p + "self_attn.q_norm.weight"))
            put(g + "attn_k_norm.weight",
                get_norm(p + "self_attn.k_norm.weight"))
        if arch in ("gemma2", "gemma3"):
            # the four norms: HF post_attention -> attn_post_norm,
            # pre_feedforward -> ffn_norm, post_feedforward -> ffn_post_norm
            put(g + "attn_post_norm.weight",
                get_norm(p + "post_attention_layernorm.weight"))
            put(g + "ffn_norm.weight",
                get_norm(p + "pre_feedforward_layernorm.weight"))
            put(g + "ffn_post_norm.weight",
                get_norm(p + "post_feedforward_layernorm.weight"))
        else:
            put(g + "ffn_norm.weight",
                get_norm(p + "post_attention_layernorm.weight"))
        sparse = False
        if model_type in _MOE_TYPES:
            # qwen2moe/qwen3moe interleave dense MLP layers (HF condition in
            # Qwen2MoeDecoderLayer): mlp_only_layers are dense, and only
            # every decoder_sparse_step-th layer is sparse.  mixtral is
            # sparse everywhere.
            n_exp = int(cfg.get("num_local_experts",
                                cfg.get("num_experts", 0)))
            step = int(cfg.get("decoder_sparse_step", 1))
            sparse = (n_exp > 0 and i not in cfg.get("mlp_only_layers", [])
                      and step > 0 and (i + 1) % step == 0)
        if sparse:
            mixtral = model_type == "mixtral"
            moe_p = p + ("block_sparse_moe." if mixtral else "mlp.")
            put(g + "ffn_gate_inp.weight", get(moe_p + "gate.weight"))
            names = (("gate", "w1"), ("up", "w3"), ("down", "w2")) \
                if mixtral else \
                (("gate", "gate_proj"), ("up", "up_proj"),
                 ("down", "down_proj"))
            for kind, hf in names:
                stacked = np.stack([
                    get(moe_p + f"experts.{e}.{hf}.weight")
                    for e in range(n_exp)])
                put(g + f"ffn_{kind}_exps.weight", stacked)
            if arch == "qwen2moe":
                put(g + "ffn_gate_shexp.weight",
                    get(moe_p + "shared_expert.gate_proj.weight"))
                put(g + "ffn_up_shexp.weight",
                    get(moe_p + "shared_expert.up_proj.weight"))
                put(g + "ffn_down_shexp.weight",
                    get(moe_p + "shared_expert.down_proj.weight"))
                put(g + "ffn_gate_inp_shexp.weight",
                    get(moe_p + "shared_expert_gate.weight"))
        else:
            put(g + "ffn_gate.weight", get(p + "mlp.gate_proj.weight"))
            put(g + "ffn_up.weight", get(p + "mlp.up_proj.weight"))
            put(g + "ffn_down.weight", get(p + "mlp.down_proj.weight"))
    put("output_norm.weight", get_norm("norm.weight"))
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"].astype(np.float32))
    # tied embeddings otherwise: loader falls back to token_embd
    w.write()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="convert_hf")
    p.add_argument("hf_dir")
    p.add_argument("dst")
    p.add_argument("--dtype", default="f16", choices=("f16", "f32", "bf16"))
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)
    convert(args.hf_dir, args.dst, args.dtype, verbose=not args.quiet)
    print(f"wrote {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
