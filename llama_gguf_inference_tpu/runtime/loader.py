"""GGUF -> JAX params loader.

Maps mmap'd quantized super-blocks directly into device layouts (SURVEY.md
§5.4: "GGUF is the checkpoint").  Two modes:

- ``quant`` (default): weight matrices stay quantized-resident as
  ``QuantLinear`` (repacked TPU layout, ``quant.repack``); norms stay f32;
  the embedding table stays quantized too (``QuantEmbedding``: rows are
  gathered + dequantized on device per token)
- ``dense``: everything dequantized to bf16 — the correctness baseline

Tensor names follow the llama.cpp GGUF export convention (``blk.N.attn_q``…),
which is what any real-world .gguf contains.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..models.config import ModelConfig
from ..ops.linear import DenseLinear, LinearWeight
from ..quant.repack import repack, to_quant_linear

_FLOAT_TYPES = (GGMLType.F32, GGMLType.F16, GGMLType.BF16)


class _Pending:
    """Placeholder for a quant tensor resolved by the bulk device upload.

    ``kind``: "linear" → QuantLinear; "embed" → QuantEmbedding (or a
    dequantized bf16 table under LGT_QUANT_EMBD=0); "tied_output" → the
    shared table as the head weight.
    """

    __slots__ = ("name", "kind")

    def __init__(self, name: str, kind: str = "linear"):
        self.name = name
        self.kind = kind


def _load_linear(reader: GGUFReader, name: str, mode: str,
                 cache=None) -> LinearWeight | _Pending:
    info = reader.tensors[name]
    out_f, in_f = info.shape  # numpy order (out, in); blocks run along in
    if mode == "dense" or info.ggml_type in _FLOAT_TYPES:
        w = reader.tensor_f32(name)
        return DenseLinear.from_f32(w, dtype=jnp.bfloat16)
    if cache is not None:
        rp = None
        if name not in cache.tensors:
            rp = repack(reader.tensor_bytes(name), info.ggml_type, out_f, in_f)
            cache.put(name, rp)            # no-op if another process holds
        if name in cache.tensors and _bulk_enabled():
            return _Pending(name)          # shipped in bulk at the end
        if rp is None:
            rp = cache.get(name)
        if rp is not None:
            return to_quant_linear(rp)
    rp = repack(reader.tensor_bytes(name), info.ggml_type, out_f, in_f)
    if cache is not None:
        cache.put(name, rp)
    return to_quant_linear(rp)


def _bulk_enabled() -> bool:
    from .device_upload import upload_enabled
    return upload_enabled()


def _load_array(reader: GGUFReader, name: str, dtype=jnp.float32):
    return jnp.asarray(reader.tensor_f32(name), dtype=dtype)


def _quant_embd_enabled() -> bool:
    return os.environ.get("LGT_QUANT_EMBD", "1").lower() not in (
        "0", "false", "no")


def _load_embedding(reader: GGUFReader, mode: str, cache=None):
    """Token embedding: quantized-resident (default) or dense bf16.

    A quantized table goes through repack (native C++, layout-cached) —
    the golden numpy codec took 200+ s for an 8B Q4_K 128256x4096 table
    on this host (VERDICT r1 weak #10).  Since r4 the repacked table
    STAYS resident (ops.linear.QuantEmbedding): rows are gathered +
    dequantized on device per token, cutting ~0.66 GB of 8B HBM at exact
    wire values.  ``LGT_QUANT_EMBD=0`` restores the dequantized bf16
    table (A/B knob).
    """
    name = "token_embd.weight"
    info = reader.tensors[name]
    if mode == "dense" or info.ggml_type in _FLOAT_TYPES:
        return _load_array(reader, name, jnp.bfloat16)
    lw = _load_linear(reader, name, mode, cache)
    if isinstance(lw, _Pending):
        return _Pending(name, "embed")
    if _quant_embd_enabled():
        from ..ops.linear import QuantEmbedding
        return QuantEmbedding(table=lw)
    return lw.dequantize(jnp.bfloat16)


def load_model(path: str | Path, mode: str = "quant", fuse: bool = False,
               lora_path: str = "", lora_scale: float = 1.0):
    """Returns (config, params, metadata).

    ``fuse=True`` row-concatenates QKV and gate+up projections into single
    linears (fewer kernel launches per layer; exact).  Leave False for
    TP-sharded use — the partition rules split per-projection.

    ``lora_path`` applies a GGUF LoRA adapter (llama-server ``--lora``;
    see runtime.lora) to the loaded weights before fusion.
    """
    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata)
    from ..models.config import SUPPORTED_ARCHES
    if cfg.arch not in SUPPORTED_ARCHES:
        raise ValueError(
            f"unsupported GGUF architecture {cfg.arch!r} "
            f"(supported: {', '.join(SUPPORTED_ARCHES)})")
    moe_relay_override = (cfg.is_moe
                          and os.environ.get("JAX_PLATFORMS", "") == "axon"
                          and "LGT_UPLOAD" not in os.environ)
    if moe_relay_override:
        # the axon relay mishandles bulk-carved buffers for MoE chunk
        # layouts (first compute stalls then ResourceExhausts — bisect in
        # DEBUGGING.md "Bulk-carve upload vs the axon relay"); per-tensor
        # transfers are slower to warm but correct.  Local TPUs unaffected.
        # Scoped to THIS load (restored in the finally below): a later
        # non-MoE load in the same process keeps the fast bulk-carve path
        # (r4 advisor finding).
        os.environ["LGT_UPLOAD"] = "tensor"
        print("[loader] axon relay + MoE model: per-tensor upload "
              "(DEBUGGING.md bulk-carve issue)", flush=True)
    cache = None
    try:
        if mode == "quant":
            from .layout_cache import LayoutCache
            cache = LayoutCache.open(path)
        params = load_params(reader, cfg, mode, fuse=fuse, cache=cache,
                             lora_path=lora_path, lora_scale=lora_scale)
        if cache is not None:
            cache.finalize()
    finally:
        if moe_relay_override:
            os.environ.pop("LGT_UPLOAD", None)
    return cfg, params, reader


def load_params(reader: GGUFReader, cfg: ModelConfig, mode: str = "quant",
                fuse: bool = False, cache=None, lora_path: str = "",
                lora_scale: float = 1.0) -> dict[str, Any]:
    t = reader.tensors
    params: dict[str, Any] = {
        "tok_embd": _load_embedding(reader, mode, cache),
        "output_norm": _load_array(reader, "output_norm.weight"),
    }
    if "output_norm.bias" in t:   # starcoder2 LayerNorm bias
        params["output_norm_bias"] = _load_array(reader, "output_norm.bias")
    # phi3 longrope per-dim frequency factor tensors
    for rf in ("rope_factors_long", "rope_factors_short"):
        if rf + ".weight" in t:
            params[rf] = _load_array(reader, rf + ".weight")
    if "output.weight" in t:
        params["output"] = _load_linear(reader, "output.weight", mode, cache)
    elif isinstance(params["tok_embd"], _Pending):
        params["output"] = _Pending(params["tok_embd"].name, "tied_output")
    else:  # tied embeddings: share the resident table with the head
        from ..ops.linear import QuantEmbedding
        emb = params["tok_embd"]
        if isinstance(emb, QuantEmbedding):
            # the head matmul runs straight off the shared quantized
            # arrays (Pallas kernel path) — no bf16 copy at all
            params["output"] = emb.table
        else:
            params["output"] = DenseLinear(w=emb, out_features=emb.shape[0],
                                           in_features=emb.shape[1])

    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer: dict[str, Any] = {
            "attn_output": _load_linear(reader, p + "attn_output.weight", mode, cache),
        }
        # pre-norms: olmo2 ships POST-norms only (attn_post_norm /
        # ffn_post_norm); command-r has no ffn_norm (one shared pre-norm
        # feeds both parallel branches).  Every other arch REQUIRES both —
        # a truncated GGUF must fail here, not silently skip the norm in
        # forward() (h = x) and generate garbage.
        for pre in ("attn_norm", "ffn_norm"):
            if p + pre + ".weight" in t:
                layer[pre] = _load_array(reader, p + pre + ".weight")
            elif not (cfg.arch == "olmo2"
                      or (cfg.arch == "command-r" and pre == "ffn_norm")):
                raise KeyError(f"{p}{pre}.weight missing from GGUF "
                               f"(required for arch {cfg.arch!r})")
        if p + "attn_kv_a_mqa.weight" in t:   # deepseek2 MLA projections
            if p + "attn_q_a.weight" in t:    # query LoRA (full-size V2/V3)
                layer["attn_q_a"] = _load_linear(reader, p + "attn_q_a.weight",
                                                 mode, cache)
                layer["attn_q_a_norm"] = _load_array(reader,
                                                     p + "attn_q_a_norm.weight")
                layer["attn_q_b"] = _load_linear(reader, p + "attn_q_b.weight",
                                                 mode, cache)
            else:                             # direct q (V2-Lite)
                layer["attn_q"] = _load_linear(reader, p + "attn_q.weight",
                                               mode, cache)
            layer["attn_kv_a_mqa"] = _load_linear(
                reader, p + "attn_kv_a_mqa.weight", mode, cache)
            layer["attn_kv_a_norm"] = _load_array(reader,
                                                  p + "attn_kv_a_norm.weight")
            layer["attn_kv_b"] = _load_linear(reader, p + "attn_kv_b.weight",
                                              mode, cache)
        elif p + "attn_qkv.weight" in t:   # phi3 ships QKV pre-fused
            layer["attn_qkv"] = _load_linear(reader, p + "attn_qkv.weight",
                                             mode, cache)
        else:
            layer["attn_q"] = _load_linear(reader, p + "attn_q.weight", mode, cache)
            layer["attn_k"] = _load_linear(reader, p + "attn_k.weight", mode, cache)
            layer["attn_v"] = _load_linear(reader, p + "attn_v.weight", mode, cache)
        # optional per-arch tensors: Q/K/V biases (qwen2), per-head Q/K
        # norms (qwen3/gemma3), post-attention/post-FFN norms (gemma2/3),
        # LayerNorm + projection biases (starcoder2) — presence in the
        # file drives presence in the pytree (models.llama checks)
        for extra in ("attn_q.bias", "attn_k.bias", "attn_v.bias",
                      "attn_q_norm.weight", "attn_k_norm.weight",
                      "attn_post_norm.weight", "ffn_post_norm.weight",
                      "attn_output.bias", "attn_norm.bias", "ffn_norm.bias",
                      "ffn_up.bias", "ffn_down.bias"):
            if p + extra in t:
                key = extra.replace(".weight", "").replace(".", "_")
                layer[key] = _load_array(reader, p + extra)
        if cfg.is_moe and p + "ffn_gate_inp.weight" in t:
            # per-layer: deepseek2's leading layers are dense (no router)
            layer["ffn_gate_inp"] = _load_linear(reader, p + "ffn_gate_inp.weight",
                                                 mode, cache)
            layer["experts"] = _load_experts(reader, p, cfg, mode, cache)
            if p + "ffn_gate_shexp.weight" in t:
                # always-on shared experts (deepseek2, qwen2moe)
                layer["shared_experts"] = {
                    n: _load_linear(reader, p + f"{n}_shexp.weight",
                                    mode, cache)
                    for n in ("ffn_gate", "ffn_up", "ffn_down")
                }
            if p + "ffn_gate_inp_shexp.weight" in t:
                # qwen2moe: per-token sigmoid gate on the shared expert
                # (llm_build_qwen2moe's ffn_gate_inp_shexp sigmoid-mul)
                layer["shared_gate"] = _load_linear(
                    reader, p + "ffn_gate_inp_shexp.weight", mode, cache)
        elif not cfg.ffn_gated:
            # plain up -> act -> down MLP (starcoder2's c_fc/c_proj)
            layer["ffn_up"] = _load_linear(reader, p + "ffn_up.weight",
                                           mode, cache)
            layer["ffn_down"] = _load_linear(reader, p + "ffn_down.weight",
                                             mode, cache)
        elif p + "ffn_gate.weight" not in t:
            # phi3 ships gate+up pre-fused as a double-height ffn_up
            layer["ffn_gateup"] = _load_linear(reader, p + "ffn_up.weight",
                                               mode, cache)
            layer["ffn_down"] = _load_linear(reader, p + "ffn_down.weight",
                                             mode, cache)
        else:
            for n in ("ffn_gate", "ffn_up", "ffn_down"):
                layer[n] = _load_linear(reader, p + f"{n}.weight", mode, cache)
        layers.append(layer)
    params["layers"] = layers
    params = _resolve_pending(params, cache)
    if lora_path:
        # BEFORE fusion (fuse_linears rejects wrapped weights, so adapted
        # projections stay per-tensor) and before MLA absorption
        from .lora import apply_lora
        apply_lora(params, lora_path, lora_scale, arch=cfg.arch)
    if fuse:
        for layer in params["layers"]:
            _fuse_layer(layer, cfg)
            _stack_layer_experts(layer)
    if cfg.is_mla:
        for layer in params["layers"]:
            _absorb_mla(layer, cfg)
    return params


def _absorb_mla(layer: dict, cfg: ModelConfig) -> None:
    """Split kv_b into dense per-head absorption matrices for the
    latent-resident MLA attention (models.llama.attention_mla): the k half
    folds into the queries, the v half expands the attended latent.  kv_b
    is small (C x H*(dn+dv)), so the dense bf16 copy costs little and the
    expanded per-head K/V never materialize in the cache."""
    kvb = layer.pop("attn_kv_b")
    w = kvb.dequantize() if isinstance(kvb, DenseLinear) \
        else kvb.dequantize(jnp.bfloat16)
    H, dn, dv = cfg.n_heads, cfg.qk_nope_head_dim, cfg.v_head_dim
    w3 = w.reshape(H, dn + dv, cfg.kv_lora_rank)
    layer["attn_kv_b_k"] = w3[:, :dn, :]
    layer["attn_kv_b_v"] = w3[:, dn:, :]


def _resolve_pending(params: dict, cache) -> dict:
    """Substitute _Pending placeholders via ONE bulk device upload.

    All cache-resident quant tensors ship as coalesced blob chunks
    (runtime.device_upload) instead of per-array transfers — the warm-boot
    hot path.  Runs before fusion so fuse_linears sees real QuantLinears.
    """
    import jax

    is_pending = lambda v: isinstance(v, _Pending)  # noqa: E731
    names = sorted({x.name for x in jax.tree_util.tree_leaves(
        params, is_leaf=is_pending) if is_pending(x)})
    if not names:
        return params
    from .device_upload import bulk_upload
    resolved = bulk_upload(cache, names)
    embeds: dict[str, Any] = {}

    def sub(x):
        if not is_pending(x):
            return x
        ql = resolved[x.name]
        if x.kind == "linear":
            return ql
        if _quant_embd_enabled():
            from ..ops.linear import QuantEmbedding
            # embed + tied head share the same device arrays
            return QuantEmbedding(table=ql) if x.kind == "embed" else ql
        if x.name not in embeds:   # dequantize once, shared by tied output
            embeds[x.name] = ql.dequantize(jnp.bfloat16)
        e = embeds[x.name]
        if x.kind == "embed":
            return e
        return DenseLinear(w=e, out_features=e.shape[0],
                           in_features=e.shape[1])

    return jax.tree_util.tree_map(sub, params, is_leaf=is_pending)


def _stack_layer_experts(layer: dict) -> None:
    """Coalesce per-expert weights into stacked (E,)-leading arrays.

    Single-chip MoE layers otherwise carry ~25 small device arrays PER
    EXPERT (8 experts x 3 roles x codes/scale arrays) — ~2,500 arrays on
    a Mixtral shape, which the remote-runtime relay handles pathologically
    (per-array transfer/bookkeeping overhead measured in minutes, r4).
    Stacking gives ~9 big arrays per layer (the 8B dense class); the
    forward slices expert ``e`` back out statically
    (models.llama._expert_views), which XLA lowers to free views of the
    same buffers.  Same representation the EP mesh path uses
    (parallel.partition.stack_experts).
    """
    if "experts" not in layer:
        return
    from ..ops.linear import DenseLinear, QuantLinear
    from ..parallel.partition import stack_experts
    experts = layer["experts"]

    def geom(w):
        if isinstance(w, DenseLinear):
            return ("dense", w.w.shape, w.w.dtype)
        if isinstance(w, QuantLinear):
            return (w.fmt, w.bits, w.sub_size, w.d_size, w.code_bias,
                    w.out_features, w.in_features, w.sc is None,
                    w.dmin is None, w.mn is None)
        return None                       # LoRA-wrapped etc: don't stack

    for role in ("ffn_gate", "ffn_up", "ffn_down"):
        gs = {geom(ex[role]) for ex in experts}
        if len(gs) != 1 or None in gs:
            return                        # mixed geometry: keep the list
    layer.pop("experts")
    layer["experts_st"] = {
        role: stack_experts(experts, role)
        for role in ("ffn_gate", "ffn_up", "ffn_down")
    }


def _fuse_layer(layer: dict, cfg: ModelConfig) -> None:
    """Row-concatenate QKV and gate+up projections in place (exact)."""
    if "attn_q" not in layer or "attn_k" not in layer:
        return   # pre-fused (phi3) or MLA (deepseek2: no separate K/V)
    if "attn_q_norm" in layer and layer["attn_q_norm"].shape[-1] != cfg.head_dim:
        return   # olmo2's FLAT q/k norms apply pre-reshape on separate q/k
    from ..ops.linear import fuse_linears
    qkv = fuse_linears([layer["attn_q"], layer["attn_k"], layer["attn_v"]])
    if qkv is not None:
        layer["attn_qkv"] = qkv
        del layer["attn_q"], layer["attn_k"], layer["attn_v"]
        if "attn_q_bias" in layer:   # fuse the qwen2 biases too
            layer["attn_qkv_bias"] = jnp.concatenate(
                [layer.pop("attn_q_bias"), layer.pop("attn_k_bias"),
                 layer.pop("attn_v_bias")])
    if not cfg.is_moe and "ffn_gate" in layer:
        gu = fuse_linears([layer["ffn_gate"], layer["ffn_up"]])
        if gu is not None:
            layer["ffn_gateup"] = gu
            del layer["ffn_gate"], layer["ffn_up"]


def _load_experts(reader: GGUFReader, prefix: str, cfg: ModelConfig,
                  mode: str, cache=None) -> list[dict[str, LinearWeight]]:
    """Both modern stacked ``ffn_*_exps`` 3D tensors and legacy per-expert
    ``ffn_*.{e}`` tensors."""
    t = reader.tensors
    experts: list[dict[str, LinearWeight]] = []
    if prefix + "ffn_gate_exps.weight" in t:
        for e in range(cfg.n_experts):
            ex = {}
            for n in ("ffn_gate", "ffn_up", "ffn_down"):
                name = prefix + f"{n}_exps.weight"
                info = t[name]
                n_exp, out_f, in_f = info.shape
                if mode == "dense" or info.ggml_type in _FLOAT_TYPES:
                    w = reader.tensor_f32(name)[e]
                    ex[n] = DenseLinear.from_f32(w, dtype=jnp.bfloat16)
                else:
                    ckey = f"{name}#{e}"
                    rp = None
                    if cache is not None and ckey not in cache.tensors:
                        raw = reader.tensor_bytes(name)
                        per = info.nbytes // n_exp
                        rp = repack(raw[e * per:(e + 1) * per],
                                    info.ggml_type, out_f, in_f)
                        cache.put(ckey, rp)
                    if (cache is not None and ckey in cache.tensors
                            and _bulk_enabled()):
                        ex[n] = _Pending(ckey)
                        continue
                    if rp is None and cache is not None:
                        rp = cache.get(ckey)
                    if rp is None:
                        raw = reader.tensor_bytes(name)
                        per = info.nbytes // n_exp
                        rp = repack(raw[e * per:(e + 1) * per],
                                    info.ggml_type, out_f, in_f)
                    ex[n] = to_quant_linear(rp)
            experts.append(ex)
        return experts
    for e in range(cfg.n_experts):
        experts.append({
            n: _load_linear(reader, prefix + f"{n}.{e}.weight", mode, cache)
            for n in ("ffn_gate", "ffn_up", "ffn_down")
        })
    return experts


def load_encoder(path: str | Path, mode: str = "quant"):
    """BERT-family encoder GGUF -> (EncoderConfig, params, reader).

    Tensor names follow llama.cpp's ``convert_hf_to_gguf.py::BertModel``:
    token_embd / token_types / position_embd + token_embd_norm, and per
    block attn_q/k/v(+bias), attn_output(+bias), attn_output_norm,
    ffn_up/ffn_down(+bias), layer_output_norm.  Projections load through
    the same dense/quant-resident ``LinearWeight`` machinery as the causal
    models; norms, biases, and the three embedding tables stay float.
    """
    from ..models.encoder import EncoderConfig

    reader = GGUFReader(path)
    cfg = EncoderConfig.from_gguf_metadata(reader.metadata)
    t = reader.tensors

    params: dict = {
        "tok_embd": _load_array(reader, "token_embd.weight", jnp.bfloat16),
        "type_embd": _load_array(reader, "token_types.weight", jnp.bfloat16),
        "pos_embd": _load_array(reader, "position_embd.weight", jnp.bfloat16),
        "embd_norm": _load_array(reader, "token_embd_norm.weight"),
        "embd_norm_bias": _load_array(reader, "token_embd_norm.bias"),
    }
    layers = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        layer: dict = {}
        for n in ("attn_q", "attn_k", "attn_v", "attn_output",
                  "ffn_up", "ffn_down"):
            layer[n] = _load_linear(reader, p + n + ".weight", mode)
            if p + n + ".bias" in t:
                layer[n + "_bias"] = _load_array(reader, p + n + ".bias")
        for n in ("attn_output_norm", "layer_output_norm"):
            layer[n] = _load_array(reader, p + n + ".weight")
            layer[n + "_bias"] = _load_array(reader, p + n + ".bias")
        layers.append(layer)
    params["layers"] = layers
    return cfg, params, reader
