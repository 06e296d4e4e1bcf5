"""Model hyper-parameter config derived from GGUF metadata.

The reference never sees these — it passes the GGUF path to llama-server
(``start.sh:473-480``) which derives the graph from metadata.  We do the same
from the keys written by llama.cpp converters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

from ..gguf.constants import Keys


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
    rope_scaling_type: str = "none"
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_orig_ctx: int = 0

    @property
    def is_moe(self) -> bool:
        return self.n_experts > 0

    @staticmethod
    def from_gguf_metadata(md: Mapping[str, Any]) -> "ModelConfig":
        arch = md.get(Keys.ARCHITECTURE, "llama")

        def k(template: str):
            return template.format(arch=arch)

        dim = int(md[k(Keys.EMBEDDING_LENGTH)])
        n_heads = int(md[k(Keys.HEAD_COUNT)])
        head_dim = dim // n_heads
        rope_dim = int(md.get(k(Keys.ROPE_DIMENSION_COUNT), head_dim))
        vocab = md.get(k(Keys.VOCAB_SIZE))
        if vocab is None:
            vocab = len(md[Keys.TOKENIZER_TOKENS])
        # llama.cpp rope style: "norm" (interleaved pairs) for llama/mixtral;
        # "neox" (split halves) for qwen2/phi/gptneox-family arches
        interleaved = arch in ("llama", "mixtral", "gemma", "minicpm", "mamba")
        return ModelConfig(
            arch=arch,
            vocab_size=int(vocab),
            dim=dim,
            n_layers=int(md[k(Keys.BLOCK_COUNT)]),
            n_heads=n_heads,
            n_kv_heads=int(md.get(k(Keys.HEAD_COUNT_KV), n_heads)),
            head_dim=head_dim,
            ffn_dim=int(md[k(Keys.FEED_FORWARD_LENGTH)]),
            rms_eps=float(md.get(k(Keys.LAYERNORM_RMS_EPS), 1e-5)),
            rope_base=float(md.get(k(Keys.ROPE_FREQ_BASE), 10000.0)),
            rope_dim=rope_dim,
            rope_interleaved=interleaved,
            context_length=int(md.get(k(Keys.CONTEXT_LENGTH), 4096)),
            n_experts=int(md.get(k(Keys.EXPERT_COUNT), 0)),
            n_experts_used=int(md.get(k(Keys.EXPERT_USED_COUNT), 0)),
            rope_scaling_type=str(md.get(k(Keys.ROPE_SCALING_TYPE), "none")),
            rope_scaling_factor=float(md.get(k(Keys.ROPE_SCALING_FACTOR), 1.0)),
            rope_low_freq_factor=float(
                md.get(f"{arch}.rope.scaling.low_freq_factor", 1.0)),
            rope_high_freq_factor=float(
                md.get(f"{arch}.rope.scaling.high_freq_factor", 4.0)),
            rope_orig_ctx=int(
                md.get(f"{arch}.rope.scaling.original_context_length", 0)),
        )
