"""Multi-architecture support: qwen2 / qwen3 / gemma2 / gemma3 / phi3 /
starcoder2 (+ gemma keys).

The reference serves any GGUF architecture its llama.cpp backend knows
(reference ``docs/CONFIGURATION.md:536`` names Qwen explicitly).  Two gates
per arch here:

- HF logit parity: tiny transformers checkpoint -> convert_hf -> GGUF ->
  our graph, argmax chain must match transformers' own forward (validates
  rope style, biases, q/k norms, softcaps, sliding windows, activations)
- engine end-to-end: synthesized GGUF (utils.testing) loads, generates,
  and streams through the quant path
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.models.config import ModelConfig
from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.tools.convert_hf import convert
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def _parity(model, hf_dir, tmp_path, n_tokens=12, atol=0.35,
            tie_margin=0.0):
    dst = tmp_path / "converted.gguf"
    convert(str(hf_dir), str(dst), dtype="f32", verbose=False)
    cfg, params, reader = load_model(dst, mode="dense")
    reader.close()

    rng = np.random.default_rng(7)
    ids = rng.integers(5, 250, size=(1, n_tokens)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()[0]

    cache = KVCache.zeros(cfg, 1, 32)
    logits, _ = forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                        jnp.zeros(1, jnp.int32), cache,
                        jnp.full(1, ids.shape[1], jnp.int32))
    got = np.asarray(logits)[0]
    if tie_margin:
        # tiny random checkpoints can leave the top-2 tokens closer than
        # fp noise; only demand argmax equality when HF's own margin over
        # our pick exceeds the tie threshold
        am_g = got.argmax(-1)
        margin = want.max(-1) - np.take_along_axis(
            want, am_g[:, None], -1)[:, 0]
        assert ((am_g == want.argmax(-1)) | (margin < tie_margin)).all(), \
            (am_g, want.argmax(-1), margin)
    else:
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=atol)
    return cfg


def _save(model, tmp_path, name):
    d = tmp_path / name
    model.eval()
    model.save_pretrained(d, safe_serialization=False)
    return d


def test_qwen2_hf_parity(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "qwen2" and not got_cfg.rope_interleaved


def test_qwen3_hf_parity(tmp_path):
    cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(2)
    model = transformers.Qwen3ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "qwen3" and got_cfg.head_dim == 16


def test_mixtral_hf_parity(tmp_path):
    """mixtral: llama attention + top-k routed experts, renormalized router
    (HF MixtralSparseMoeBlock).  Converts to arch "llama" + expert keys,
    matching llama.cpp's MixtralForCausalLM export."""
    cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(21)
    model = transformers.MixtralForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "llama" and got_cfg.n_experts == 4
    assert got_cfg.n_experts_used == 2 and got_cfg.moe_renorm


def test_qwen2moe_hf_parity(tmp_path):
    """qwen2moe: qwen2 attention (qkv biases) + routed experts with RAW
    softmax weights (norm_topk_prob False) + a sigmoid-gated always-on
    shared expert (llm_build_qwen2moe's ffn_*_shexp / ffn_gate_inp_shexp).
    mlp_only_layers makes layer 0 a plain dense MLP — both layer kinds in
    one checkpoint."""
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[0],
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(22)
    model = transformers.Qwen2MoeForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "qwen2moe" and got_cfg.n_experts == 4
    assert not got_cfg.moe_renorm


def test_qwen3moe_hf_parity(tmp_path):
    """qwen3moe: qwen3 attention (per-head q/k norms) + routed experts with
    renormalized top-k router weights; no shared expert."""
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=112,
        moe_intermediate_size=48, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False)
    torch.manual_seed(23)
    model = transformers.Qwen3MoeForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path,
                      tie_margin=0.02)
    assert got_cfg.arch == "qwen3moe" and got_cfg.n_experts == 4
    assert got_cfg.moe_renorm and got_cfg.head_dim == 16


def test_gemma2_hf_parity(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager")   # sdpa skips softcapping
    torch.manual_seed(3)
    model = transformers.Gemma2ForCausalLM(cfg)
    # n_tokens > window so the sliding layer's mask actually bites
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path,
                      n_tokens=14)
    assert got_cfg.arch == "gemma2"
    assert got_cfg.attn_softcap == 50.0 and got_cfg.final_softcap == 30.0
    assert got_cfg.sliding_window == 8
    assert got_cfg.is_sliding(0) and not got_cfg.is_sliding(1)
    assert got_cfg.act == "gelu_tanh" and got_cfg.embedding_scale == 8.0


def test_gemma3_hf_parity(tmp_path):
    """gemma3: q/k norms (+1 baked), 5:1 local/global SWA interleave with
    a SEPARATE local rope base, sandwich norms, no softcaps."""
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        sliding_window_pattern=6, rope_theta=1_000_000.0,
        rope_local_base_freq=10000.0, max_position_embeddings=128,
        rms_norm_eps=1e-5, attn_implementation="eager")
    torch.manual_seed(6)
    model = transformers.Gemma3ForCausalLM(cfg)
    # 7 layers: indices 0-4 slide (local rope), 5 is global, 6 slides —
    # n_tokens > window so both mask regimes and both rope bases bite
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path,
                      n_tokens=14)
    assert got_cfg.arch == "gemma3"
    assert got_cfg.sliding_window == 8 and got_cfg.swa_pattern == 6
    assert got_cfg.is_sliding(0) and not got_cfg.is_sliding(5)
    assert got_cfg.rope_base == 1_000_000.0
    assert got_cfg.rope_local_base == 10000.0
    assert got_cfg.attn_softcap == 0.0 and got_cfg.final_softcap == 0.0
    assert got_cfg.act == "gelu_tanh" and got_cfg.embedding_scale == 8.0


def test_gemma3_query_scalar_folded(tmp_path):
    """query_pre_attn_scalar != head_dim plumbs through as a post-q_norm
    attention scale (it cannot fold into Q weights: the RMS q_norm is
    scale-invariant and would erase it)."""
    cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=64, sliding_window=8,
        sliding_window_pattern=6, rope_theta=1_000_000.0,
        rope_local_base_freq=10000.0, max_position_embeddings=128,
        rms_norm_eps=1e-5, attn_implementation="eager")
    torch.manual_seed(10)   # seed 8 lands an argmax near-tie (top-2 gap
    # 0.0013 < bf16 activation noise); the check is the scale plumbing
    model = transformers.Gemma3ForCausalLM(cfg)
    _parity(model, _save(model, tmp_path, "hf"), tmp_path, n_tokens=10)


def test_starcoder2_hf_parity(tmp_path):
    """starcoder2: LayerNorm+bias, biased projections, un-gated gelu MLP,
    tied embeddings."""
    cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, norm_epsilon=1e-5, rope_theta=10000.0,
        use_bias=True, tie_word_embeddings=True)
    torch.manual_seed(7)
    model = transformers.Starcoder2ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "starcoder2"
    assert got_cfg.norm_type == "layernorm" and not got_cfg.ffn_gated
    assert not got_cfg.rope_interleaved


def test_granite_hf_parity(tmp_path):
    """granite: llama graph + 4 scalar multipliers (embedding, residual,
    attention-score, 1/logits_scaling on the head)."""
    cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        attention_multiplier=0.0156, logits_scaling=8.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(21)
    model = transformers.GraniteForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "granite" and got_cfg.rope_interleaved
    assert got_cfg.embedding_scale == 12.0
    assert got_cfg.residual_scale == pytest.approx(0.22)   # f32 round-trip
    assert got_cfg.attn_scale == pytest.approx(0.0156)
    assert abs(got_cfg.logit_multiplier - 1 / 8.0) < 1e-7


def test_command_r_hf_parity(tmp_path):
    """command-r (cohere): bias-free LayerNorm, PARALLEL attention+FFN
    residual off one shared pre-norm, logit_scale multiplier, tied
    embeddings, interleaved rope WITHOUT the convert-time permute (HF
    cohere already rotates interleaved pairs)."""
    cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, layer_norm_eps=1e-5, rope_theta=10000.0,
        logit_scale=0.25, use_qk_norm=False, tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(22)
    model = transformers.CohereForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "command-r"
    assert got_cfg.parallel_residual and got_cfg.rope_interleaved
    assert got_cfg.norm_type == "layernorm"
    assert got_cfg.logit_multiplier == 0.25


def test_olmo2_hf_parity(tmp_path):
    """olmo2: POST-norm-only placement (attention/FFN read the raw
    residual; norms apply to the branch outputs), FLAT q/k RMSNorms over
    the whole projection, neox rope."""
    cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(24)   # seed 23 lands an argmax near-tie (< bf16
    # activation noise under the dense path)
    model = transformers.Olmo2ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "olmo2" and not got_cfg.rope_interleaved


def test_deepseek2_lite_hf_parity(tmp_path):
    """deepseek2 (V2-Lite shape): MLA with direct q projection, decoupled
    rope, leading dense layer, shared + routed experts, no weight renorm,
    routed scaling."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=24,
        qk_rope_head_dim=8, v_head_dim=20,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=False, topk_method="greedy", n_group=1, topk_group=1,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(14)   # seed 11 lands an argmax near-tie (top-2 gap
    # 0.0023 < bf16 noise) under the absorbed latent formulation
    model = transformers.DeepseekV2ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "deepseek2" and got_cfg.is_mla
    assert got_cfg.kv_lora_rank == 32 and got_cfg.q_lora_rank == 0
    # latent-resident cache: ONE shared head, (k_pe dims, latent rank)
    assert got_cfg.kv_cache_dims == (8, 32)
    assert got_cfg.cache_kv_heads == 1
    assert got_cfg.n_dense_layers == 1 and got_cfg.n_shared_experts == 1
    assert got_cfg.routed_scale == 1.5 and not got_cfg.moe_renorm


def test_deepseek2_full_hf_parity(tmp_path):
    """Full-size shape: query LoRA + group-limited greedy routing."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_nope_head_dim=24,
        qk_rope_head_dim=8, v_head_dim=20,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=2,
        first_k_dense_replace=1, routed_scaling_factor=2.0,
        norm_topk_prob=False, topk_method="group_limited_greedy",
        n_group=4, topk_group=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(12)
    model = transformers.DeepseekV2ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.q_lora_rank == 24
    assert got_cfg.n_expert_groups == 4 and got_cfg.topk_groups == 2


def test_deepseek2_yarn_parity(tmp_path):
    """YaRN long-context rope: ramped frequency interpolation + the
    mscale^2 score correction folded into attn_scale."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=24,
        qk_rope_head_dim=8, v_head_dim=20, n_routed_experts=None,
        first_k_dense_replace=2,
        rope_scaling={"type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32, "beta_slow": 1,
                      "mscale": 0.707, "mscale_all_dim": 0.707},
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(13)
    model = transformers.DeepseekV2ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.rope_scaling_type == "yarn"
    assert got_cfg.rope_orig_ctx == 32 and got_cfg.rope_scaling_factor == 4.0
    assert got_cfg.attn_scale > 0


def test_phi3_hf_parity(tmp_path):
    """phi3: fused QKV + fused gate_up, neox rope."""
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2)
    torch.manual_seed(4)
    model = transformers.Phi3ForCausalLM(cfg)
    got_cfg = _parity(model, _save(model, tmp_path, "hf"), tmp_path)
    assert got_cfg.arch == "phi3" and not got_cfg.rope_interleaved


def test_phi3_longrope_parity(tmp_path):
    """longrope: per-dim factors + the sqrt(1+ln(f)/ln(orig)) magnitude
    scale, short factors selected at S <= original context."""
    half = 8   # head_dim 16
    short = [1.0 + 0.05 * i for i in range(half)]
    long = [2.0 + 0.1 * i for i in range(half)]
    cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=32,
        rope_scaling={"type": "longrope", "short_factor": short,
                      "long_factor": long},
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(5)
    model = transformers.Phi3ForCausalLM(cfg)

    dst = tmp_path / "converted.gguf"
    convert(str(_save(model, tmp_path, "hf")), str(dst), dtype="f32",
            verbose=False)
    mcfg, params, reader = load_model(dst, mode="dense")
    reader.close()
    assert mcfg.rope_scaling_type == "longrope"
    assert mcfg.rope_orig_ctx == 32
    import math
    np.testing.assert_allclose(
        mcfg.rope_attn_factor, math.sqrt(1 + math.log(2) / math.log(32)))
    assert "rope_factors_short" in params and "rope_factors_long" in params

    rng = np.random.default_rng(11)
    ids = rng.integers(5, 250, size=(1, 12)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()[0]
    # cache S == original ctx -> short factors (HF picks short at init)
    cache = KVCache.zeros(mcfg, 1, 32)
    logits, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)),
                        jnp.zeros(1, jnp.int32), cache,
                        jnp.full(1, ids.shape[1], jnp.int32))
    got = np.asarray(logits)[0]
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, atol=0.35)


@pytest.mark.parametrize("arch", ["qwen2", "qwen3", "qwen2moe", "qwen3moe",
                                  "gemma2", "gemma3",
                                  "phi3", "starcoder2", "deepseek2",
                                  "granite", "command-r", "olmo2"])
def test_arch_engine_end_to_end(arch, tmp_path):
    """Synthesized GGUF per arch: quant-mode load + engine generate."""
    from llama_gguf_inference_tpu.runtime.engine import (
        EngineConfig, InferenceEngine,
    )
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    p = tmp_path / f"{arch}.gguf"
    moe = dict(n_experts=4, n_experts_used=2) if arch.endswith("moe") else {}
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0, arch=arch,
                     sliding_window=16, **moe)
    eng = InferenceEngine(str(p), EngineConfig(
        max_slots=1, ctx=64, prefill_buckets=(16,), mode="quant",
        multi_step=2))
    eng.start()
    try:
        toks = [ev.token_id for ev in
                eng.generate("hello world", SamplingParams(
                    temperature=0.0, max_tokens=6))]
        assert len(toks) >= 1
    finally:
        eng.stop()


def test_arch_quant_matches_dense(tmp_path):
    """Quant-resident path agrees with dense for a non-llama arch."""
    p = tmp_path / "q.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0, arch="qwen2")
    ids = np.array([[5, 100, 42, 7]], np.int32)
    outs = {}
    for mode in ("dense", "quant"):
        cfg, params, reader = load_model(p, mode=mode)
        reader.close()
        cache = KVCache.zeros(cfg, 1, 16)
        logits, _ = forward(params, cfg, jnp.asarray(ids),
                            jnp.zeros(1, jnp.int32), cache,
                            jnp.full(1, 4, jnp.int32))
        outs[mode] = np.asarray(logits)[0]
    np.testing.assert_allclose(outs["quant"], outs["dense"],
                               atol=0.15, rtol=0.1)


def test_qwen2_sharded_forward_matches(tmp_path):
    """TP sharding must carry the per-arch extras (biases) — a dropped
    bias shows up as a logit mismatch here."""
    import jax
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh
    from llama_gguf_inference_tpu.parallel.partition import (
        batch_sharding, cache_sharding, shard_params,
    )

    p = tmp_path / "q.gguf"
    write_tiny_llama(p, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256, quant=GGMLType.Q8_0, arch="qwen2")
    cfg, params, reader = load_model(p, mode="quant")
    reader.close()
    ids = np.full((8, 4), 7, np.int32)
    offsets = jnp.zeros(8, jnp.int32)
    lengths = jnp.full(8, 4, jnp.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids), offsets,
                     KVCache.zeros(cfg, 8, 16), lengths)

    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(params, cfg, mesh)
    cache_s = jax.device_put(KVCache.zeros(cfg, 8, 16),
                             cache_sharding(mesh, cfg.n_kv_heads, 8))
    ids_s = jax.device_put(jnp.asarray(ids), batch_sharding(mesh, 8))
    step = jax.jit(forward, static_argnums=(1,))
    got, _ = step(sp, cfg, ids_s, offsets, cache_s, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("arch", ["starcoder2", "deepseek2", "qwen2moe"])
def test_new_arch_sharded_forward_matches(arch, tmp_path):
    """TP rules for newer archs: starcoder2 (plain MLP, biases), deepseek2
    (MLA projections), and qwen2moe (TP-sharded gated shared expert beside
    EP-sharded routed experts) must shard without KeyError and match the
    single-device logits."""
    import jax
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh
    from llama_gguf_inference_tpu.parallel.partition import (
        batch_sharding, cache_sharding, shard_params,
    )

    p = tmp_path / f"{arch}.gguf"
    moe = dict(n_experts=4, n_experts_used=2) if arch.endswith("moe") else {}
    write_tiny_llama(p, dim=128, n_layers=2, n_heads=8, n_kv_heads=8,
                     ffn_dim=256, quant=GGMLType.Q8_0, arch=arch, **moe)
    cfg, params, reader = load_model(p, mode="quant")
    reader.close()
    ids = np.full((8, 4), 7, np.int32)
    offsets = jnp.zeros(8, jnp.int32)
    lengths = jnp.full(8, 4, jnp.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids), offsets,
                     KVCache.zeros(cfg, 8, 16), lengths)

    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(params, cfg, mesh)
    cache_s = jax.device_put(KVCache.zeros(cfg, 8, 16),
                             cache_sharding(mesh, cfg.cache_kv_heads, 8))
    ids_s = jax.device_put(jnp.asarray(ids), batch_sharding(mesh, 8))
    step = jax.jit(forward, static_argnums=(1,))
    got, _ = step(sp, cfg, ids_s, offsets, cache_s, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_unsupported_arch_rejected(tmp_path):
    from llama_gguf_inference_tpu.gguf.writer import GGUFWriter
    from llama_gguf_inference_tpu.gguf.constants import Keys
    from llama_gguf_inference_tpu.utils.testing import make_tiny_vocab

    p = tmp_path / "bad.gguf"
    w = GGUFWriter(p)
    tokens, scores, types = make_tiny_vocab()
    w.add(Keys.ARCHITECTURE, "mamba")
    w.add("mamba.embedding_length", 64)
    w.add("mamba.block_count", 1)
    w.add("mamba.feed_forward_length", 96)
    w.add("mamba.attention.head_count", 4)
    w.add(Keys.TOKENIZER_MODEL, "llama")
    w.add(Keys.TOKENIZER_TOKENS, tokens)
    w.add(Keys.TOKENIZER_SCORES, np.asarray(scores, np.float32))
    w.add(Keys.TOKENIZER_TOKEN_TYPE, np.asarray(types, np.int32))
    w.add_tensor("token_embd.weight", np.zeros((len(tokens), 64), np.float32),
                 GGMLType.F32)
    w.write()
    with pytest.raises(ValueError, match="unsupported GGUF architecture"):
        load_model(p)


def test_gemma2_27b_attn_scale():
    """llama.cpp's 27B special case: scale = 1/sqrt(dim/n_heads)."""
    md = {
        "general.architecture": "gemma2",
        "gemma2.embedding_length": 4608,
        "gemma2.block_count": 46,
        "gemma2.attention.head_count": 32,
        "gemma2.attention.head_count_kv": 16,
        "gemma2.attention.key_length": 128,
        "gemma2.feed_forward_length": 36864,
        "gemma2.vocab_size": 256128,
    }
    cfg = ModelConfig.from_gguf_metadata(md)
    assert cfg.head_dim == 128
    np.testing.assert_allclose(cfg.attn_scale, (4608 / 32) ** -0.5)
