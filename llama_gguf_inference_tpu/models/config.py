"""Model hyper-parameter config derived from GGUF metadata.

The reference never sees these — it passes the GGUF path to llama-server
(``start.sh:473-480``) which derives the graph from metadata; llama.cpp
serves every architecture its converters emit.  We do the same from the
keys written by llama.cpp converters for the families this engine
implements: llama/mistral/mixtral, qwen2, qwen3, qwen2moe, qwen3moe,
gemma, gemma2, gemma3, phi3, starcoder2, deepseek2, granite, command-r,
olmo2.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping

from ..gguf.constants import Keys

# GGUF rope style per architecture (llama.cpp ``llama_rope_type``):
# "norm" = interleaved pairs (convert scripts permute Q/K for these;
# command-r's HF layout is already interleaved so it ships unpermuted);
# everything else ships "neox" = split halves.
_ROPE_NORM_ARCHES = ("llama", "mixtral", "minicpm", "deci", "deepseek2",
                     "granite", "command-r")

# architectures this engine can build a graph for (loader + models.llama)
SUPPORTED_ARCHES = ("llama", "mixtral", "qwen2", "qwen3", "qwen2moe",
                    "qwen3moe", "gemma", "gemma2", "gemma3", "phi3",
                    "starcoder2", "deepseek2", "granite", "command-r",
                    "olmo2")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str = "llama"
    vocab_size: int = 32000
    dim: int = 4096                  # embedding_length
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    head_dim: int = 128
    ffn_dim: int = 11008
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    rope_dim: int = 128              # rotary dims per head
    rope_interleaved: bool = True    # GGUF "norm" rope style (llama arch)
    context_length: int = 4096
    n_experts: int = 0               # MoE (mixtral): total experts
    n_experts_used: int = 0          # top-k routed experts
    tie_embeddings: bool = False
    # rope scaling (long-context): "none" | "linear" | "yarn" | "llama3"
    #                            | "longrope" (phi3; per-dim factor tensors)
    rope_scaling_type: str = "none"
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_orig_ctx: int = 0
    rope_attn_factor: float = 1.0    # longrope cos/sin magnitude scale
    # -- per-architecture graph variations ----------------------------------
    act: str = "silu"                # FFN gate activation: "silu" | "gelu_tanh"
    embedding_scale: float = 1.0     # gemma: sqrt(dim) multiplier on embeddings
    attn_scale: float = 0.0          # 0 => default 1/sqrt(head_dim)
    attn_softcap: float = 0.0        # gemma2: softcap*tanh(scores/softcap)
    final_softcap: float = 0.0       # gemma2: applied to output logits
    sliding_window: int = 0          # SWA width (0 = full attention)
    swa_pattern: int = 0             # every Nth layer (idx%N==N-1) is full attn
    rope_local_base: float = 0.0     # gemma3: SWA layers' rope base (0 = same)
    norm_type: str = "rms"           # "rms" | "layernorm" (starcoder2)
    ffn_gated: bool = True           # False: plain up->act->down MLP
    residual_scale: float = 1.0      # granite: multiplier on residual adds
    logit_multiplier: float = 1.0    # command-r: x logit_scale;
    #                                  granite: x 1/logits_scaling
    parallel_residual: bool = False  # command-r: x + attn(n) + ffn(n),
    #                                  one shared pre-norm for both branches
    # -- deepseek2 multi-head latent attention + DeepSeekMoE ----------------
    q_lora_rank: int = 0             # 0 = direct q projection (V2-Lite)
    kv_lora_rank: int = 0            # > 0 selects the MLA attention path
    qk_nope_head_dim: int = 0        # per-head un-roped query/key dims
    qk_rope_head_dim: int = 0        # per-head roped (decoupled) dims
    v_head_dim: int = 0              # per-head value dims (!= qk dims)
    n_shared_experts: int = 0        # always-on experts alongside routed
    n_dense_layers: int = 0          # leading layers with a dense FFN
    routed_scale: float = 1.0        # multiplier on routed-expert weights
    moe_renorm: bool = True          # renormalize top-k router weights
    n_expert_groups: int = 1         # group-limited routing (device groups)
    topk_groups: int = 1             # groups considered per token

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    @property
    def kv_cache_dims(self) -> tuple[int, int]:
        """(k_dim, v_dim) per cache head.  MLA caches the LATENT (one
        shared head: k = roped decoupled dims, v = the compressed c_kv —
        see models.llama.attention_mla's absorbed formulation); everything
        else is uniform head_dim."""
        if self.is_mla:
            return (self.qk_rope_head_dim, self.kv_lora_rank)
        return (self.head_dim, self.head_dim)

    @property
    def cache_kv_heads(self) -> int:
        """KV heads in the CACHE: MLA's latent is shared by every query
        head (MQA-like), everything else stores n_kv_heads."""
        return 1 if self.is_mla else self.n_kv_heads

    @property
    def is_moe(self) -> bool:
        return self.n_experts > 0

    def is_sliding(self, layer_idx: int) -> bool:
        """Whether this layer uses sliding-window attention.  Pattern 1 =
        every layer slides (phi3); gemma2 uses 2 (even layers slide, odd
        full — llama.cpp ``llm_build_gemma2``'s ``il % 2 == 0``),
        generalized as idx % pattern != pattern-1."""
        if self.sliding_window <= 0 or self.swa_pattern <= 0:
            return False
        if self.swa_pattern == 1:
            return True
        return layer_idx % self.swa_pattern != self.swa_pattern - 1

    @staticmethod
    def from_gguf_metadata(md: Mapping[str, Any]) -> "ModelConfig":
        arch = md.get(Keys.ARCHITECTURE, "llama")

        def k(template: str):
            return template.format(arch=arch)

        dim = int(md[k(Keys.EMBEDDING_LENGTH)])
        n_heads = int(md[k(Keys.HEAD_COUNT)])
        # key_length overrides head_dim (qwen3, gemma: head_dim != dim/heads)
        head_dim = int(md.get(f"{arch}.attention.key_length", dim // n_heads))
        rope_dim = int(md.get(k(Keys.ROPE_DIMENSION_COUNT), head_dim))
        vocab = md.get(k(Keys.VOCAB_SIZE))
        if vocab is None:
            vocab = len(md[Keys.TOKENIZER_TOKENS])
        interleaved = arch in _ROPE_NORM_ARCHES

        # per-arch graph variations (matching llama.cpp's builders; real
        # GGUF files carry gemma norm weights with +1 pre-baked by the
        # upstream converter, so no runtime norm offset is needed)
        act = "silu"
        embedding_scale = 1.0
        attn_scale = 0.0
        attn_softcap = 0.0
        final_softcap = 0.0
        sliding_window = 0
        swa_pattern = 0
        n_layers = int(md[k(Keys.BLOCK_COUNT)])
        if arch in ("gemma", "gemma2"):
            act = "gelu_tanh"
            embedding_scale = math.sqrt(dim)
        if arch == "gemma2":
            attn_softcap = float(md.get("gemma2.attn_logit_softcapping", 50.0))
            final_softcap = float(md.get("gemma2.final_logit_softcapping", 30.0))
            sliding_window = int(md.get("gemma2.attention.sliding_window", 4096))
            swa_pattern = 2
            # llama.cpp llm_build_gemma2: queries scale by 1/sqrt(head_dim)
            # except the 27B (46 layers), which uses 1/sqrt(dim/n_heads)
            # (HF query_pre_attn_scalar)
            attn_scale = 1.0 / math.sqrt(
                dim / n_heads if n_layers == 46 else head_dim)
        if arch == "phi3":
            # phi-3-mini-4k ships sliding_window 2047 on every layer
            sliding_window = int(md.get("phi3.attention.sliding_window", 0))
            swa_pattern = 1 if sliding_window else 0
        rope_local_base = 0.0
        norm_type = "rms"
        ffn_gated = True
        rope_base_default = 10000.0
        if arch == "gemma3":
            # 5 local : 1 global interleave; local (sliding) layers run a
            # separate short rope base with NO long-context scaling
            act = "gelu_tanh"
            embedding_scale = math.sqrt(dim)
            sliding_window = int(md.get("gemma3.attention.sliding_window",
                                        1024))
            swa_pattern = 6
            rope_base_default = 1_000_000.0
            rope_local_base = float(
                md.get("gemma3.rope.local_freq_base",
                       md.get("gemma3.rope.freq_base_swa", 10000.0)))
            # query scale: 1b/4b/12b use 1/sqrt(head_dim) (scalar == 256 ==
            # head_dim); the 27B (62 layers) uses query_pre_attn_scalar =
            # dim/n_heads like gemma2-27B — llama.cpp special-cases it by
            # size since no GGUF key carries the scalar.  Our converter
            # additionally records the exact value when it differs.
            scalar = float(md.get(
                "gemma3.attention.query_pre_attn_scalar",
                dim / n_heads if n_layers == 62 else head_dim))
            if scalar != head_dim:   # post-q_norm score scale (see convert)
                attn_scale = 1.0 / math.sqrt(scalar)
        if arch == "starcoder2":
            # LayerNorm (mean-centered, biased) + bias on every projection
            # + plain gelu MLP (c_fc -> gelu -> c_proj, no gate)
            norm_type = "layernorm"
            ffn_gated = False
            act = "gelu_tanh"
        residual_scale = 1.0
        logit_multiplier = 1.0
        parallel_residual = False
        if arch == "granite":
            # llama graph + 4 scalar multipliers (llm_build_granite):
            # embeddings x embedding_scale, residual adds x residual_scale,
            # attention scores x attention.scale (replaces 1/sqrt(hd)),
            # final logits / logit_scale
            embedding_scale = float(md.get("granite.embedding_scale", 1.0))
            residual_scale = float(md.get("granite.residual_scale", 1.0))
            attn_scale = float(md.get("granite.attention.scale", 0.0))
            ls = float(md.get("granite.logit_scale", 0.0))
            if ls > 0.0:
                logit_multiplier = 1.0 / ls
        if arch == "command-r":
            # bias-free LayerNorm, parallel attention+FFN residual off one
            # shared pre-norm, logits x logit_scale (llm_build_command_r)
            norm_type = "layernorm"
            parallel_residual = True
            logit_multiplier = float(md.get("command-r.logit_scale", 1.0))
        q_lora = kv_lora = qk_nope = qk_rope = v_hd = 0
        n_shared = n_dense = 0
        routed_scale = 1.0
        moe_renorm = True
        n_groups = topk_groups = 1
        if arch in ("qwen2moe", "qwen3moe"):
            # llama.cpp's llm_build_qwen2moe keeps RAW softmax weights
            # (norm_topk_prob False in released Qwen1.5/2 MoE checkpoints)
            # while llm_build_qwen3moe renormalizes the selected top-k;
            # honor an explicit expert_weights_norm key when our converter
            # wrote one, else the per-arch llama.cpp hardcoded behavior.
            moe_renorm = bool(md.get(f"{arch}.expert_weights_norm",
                                     arch == "qwen3moe"))
        if arch == "deepseek2":
            q_lora = int(md.get("deepseek2.attention.q_lora_rank", 0))
            kv_lora = int(md.get("deepseek2.attention.kv_lora_rank", 512))
            qk_rope = rope_dim       # rope.dimension_count = decoupled dims
            qk_nope = head_dim - qk_rope
            v_hd = int(md.get("deepseek2.attention.value_length",
                              head_dim - qk_rope))
            n_shared = int(md.get("deepseek2.expert_shared_count", 0))
            n_dense = int(md.get("deepseek2.leading_dense_block_count", 0))
            routed_scale = float(md.get("deepseek2.expert_weights_scale", 1.0))
            moe_renorm = bool(md.get("deepseek2.expert_weights_norm", False))
            n_groups = int(md.get("deepseek2.expert_group_count", 1))
            topk_groups = int(md.get("deepseek2.expert_group_used_count", 1))
            # YaRN magnitude correction: released deepseek checkpoints use
            # mscale == mscale_all_dim, so cos/sin stay unscaled and the
            # whole correction folds into the score scale (llama.cpp's
            # kq_scale = mscale^2 / sqrt(dk) with
            # mscale = 1 + yarn_log_mul * ln(factor))
            log_mul = float(
                md.get("deepseek2.rope.scaling.yarn_log_multiplier", 0.0))
            factor = float(md.get(k(Keys.ROPE_SCALING_FACTOR), 1.0))
            if (str(md.get(k(Keys.ROPE_SCALING_TYPE), "none")) == "yarn"
                    and factor > 1.0 and log_mul):
                ms = 1.0 + log_mul * math.log(factor)
                attn_scale = ms * ms / math.sqrt(head_dim)

        # longrope magnitude scale: explicit key, else the HF formula
        # sqrt(1 + ln(ctx/orig)/ln(orig)) when the file extends the context
        scaling_type = str(md.get(k(Keys.ROPE_SCALING_TYPE), "none"))
        orig_ctx = int(md.get(f"{arch}.rope.scaling.original_context_length", 0))
        ctx_len = int(md.get(k(Keys.CONTEXT_LENGTH), 4096))
        attn_factor = float(md.get(f"{arch}.rope.scaling.attn_factor", 0.0))
        if attn_factor <= 0.0:
            attn_factor = 1.0
            if scaling_type == "longrope" and 0 < orig_ctx < ctx_len:
                attn_factor = math.sqrt(
                    1.0 + math.log(ctx_len / orig_ctx) / math.log(orig_ctx))

        return ModelConfig(
            arch=arch,
            vocab_size=int(vocab),
            dim=dim,
            n_layers=n_layers,
            n_heads=n_heads,
            n_kv_heads=int(md.get(k(Keys.HEAD_COUNT_KV), n_heads)),
            head_dim=head_dim,
            ffn_dim=int(md[k(Keys.FEED_FORWARD_LENGTH)]),
            rms_eps=float(md.get(k(Keys.LAYERNORM_RMS_EPS),
                                 md.get(f"{arch}.attention.layer_norm_epsilon",
                                        1e-5))),
            rope_base=float(md.get(k(Keys.ROPE_FREQ_BASE), rope_base_default)),
            rope_dim=rope_dim,
            rope_interleaved=interleaved,
            context_length=ctx_len,
            n_experts=int(md.get(k(Keys.EXPERT_COUNT), 0)),
            n_experts_used=int(md.get(k(Keys.EXPERT_USED_COUNT), 0)),
            rope_scaling_type=scaling_type,
            rope_scaling_factor=float(md.get(k(Keys.ROPE_SCALING_FACTOR), 1.0)),
            rope_low_freq_factor=float(
                md.get(f"{arch}.rope.scaling.low_freq_factor", 1.0)),
            rope_high_freq_factor=float(
                md.get(f"{arch}.rope.scaling.high_freq_factor", 4.0)),
            rope_orig_ctx=orig_ctx,
            rope_attn_factor=attn_factor,
            act=act,
            embedding_scale=embedding_scale,
            attn_scale=attn_scale,
            attn_softcap=attn_softcap,
            final_softcap=final_softcap,
            sliding_window=sliding_window,
            swa_pattern=swa_pattern,
            rope_local_base=rope_local_base,
            norm_type=norm_type,
            ffn_gated=ffn_gated,
            residual_scale=residual_scale,
            logit_multiplier=logit_multiplier,
            parallel_residual=parallel_residual,
            q_lora_rank=q_lora,
            kv_lora_rank=kv_lora,
            qk_nope_head_dim=qk_nope,
            qk_rope_head_dim=qk_rope,
            v_head_dim=v_hd,
            n_shared_experts=n_shared,
            n_dense_layers=n_dense,
            routed_scale=routed_scale,
            moe_renorm=moe_renorm,
            n_expert_groups=n_groups,
            topk_groups=topk_groups,
        )
