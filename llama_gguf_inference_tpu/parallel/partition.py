"""Partition rules: map model params onto the (dp, tp) mesh.

Megatron-style tensor parallelism adapted to quantized-resident weights
(SURVEY.md §7 step 7).  The invariant that makes TP safe for GGUF block
formats: **quantization blocks run along in_features**, so

- column-parallel layers (attn_q/k/v, ffn_gate/up, output head) shard
  ``out_features`` — blocks always stay intact;
- row-parallel layers (attn_output, ffn_down) shard ``in_features`` — legal
  only when ``in_features / tp`` is a multiple of the super-block size (256
  for K-quants, 32 for Q4_0/Q8_0); checked at shard time.

All QuantLinear arrays (codes/d/sc/dmin/mn) share their leading out_features
axis, so one PartitionSpec per weight covers the whole pytree node.  XLA
derives the collectives: activations enter row-parallel layers sharded on the
feature axis and leave as psum over ICI — nothing manual.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..ops.linear import DenseLinear, QuantLinear
from .mesh import AXIS_DP, AXIS_TP


def _block_multiple(w: QuantLinear | DenseLinear) -> int:
    if isinstance(w, QuantLinear):
        return w.d_size
    return 1


def shard_decision(out_f: int, in_f: int, dim: int, tp: int,
                   blk: int = 1) -> bool:
    """Whether a (out, in) weight can shard on ``dim`` across ``tp`` chips.

    The single source of truth for the TP divisibility rules — used by
    :func:`_shard_linear` at placement time and by
    ``parallel.scaling.shard_plan`` to validate production shapes (70B)
    without materializing arrays.  ``blk`` is the quant super-block size
    (d_size); row-parallel shards must keep super-blocks intact.
    """
    size = out_f if dim == 0 else in_f
    if tp <= 1:
        return True
    if size % tp:
        return False
    if dim == 1 and blk > 1 and (in_f // tp) % blk:
        return False
    return True


def _shard_linear(w, mesh: Mesh, axis: str, dim: int):
    """dim 0 = column-parallel (out), dim 1 = row-parallel (in)."""
    tp = mesh.shape[axis]
    from ..ops.linear import LoraLinear
    if isinstance(w, LoraLinear):
        # LoRA wrapper: base follows the normal rule; the rank-r factors
        # are tiny — B (out, r) shards with the out axis when column-
        # parallel, A and anything non-divisible replicate
        rep = NamedSharding(mesh, P())
        b_spec = rep
        if dim == 0 and tp > 1 and w.b.shape[0] % tp == 0:
            b_spec = NamedSharding(mesh, P(axis, None))
        a_spec = rep
        if dim == 1 and tp > 1 and w.a.shape[1] % tp == 0:
            a_spec = NamedSharding(mesh, P(None, axis))
        return LoraLinear(base=_shard_linear(w.base, mesh, axis, dim),
                          a=jax.device_put(w.a, a_spec),
                          b=jax.device_put(w.b, b_spec), scale=w.scale)
    if tp == 1:
        return _device_put_tree(w, NamedSharding(mesh, P()))
    if not shard_decision(w.out_features, w.in_features, dim, tp,
                          _block_multiple(w)):
        # non-divisible axis (e.g. odd vocab) or a shard boundary that would
        # split quant super-blocks: replicate rather than fail — padding the
        # axis is the perf fix, done by the loader for production shapes
        return _device_put_tree(w, NamedSharding(mesh, P()))
    if isinstance(w, DenseLinear):
        spec = P(axis, None) if dim == 0 else P(None, axis)
        return DenseLinear(w=jax.device_put(w.w, NamedSharding(mesh, spec)),
                           out_features=w.out_features, in_features=w.in_features)
    assert isinstance(w, QuantLinear)
    if dim == 0:
        spec = NamedSharding(mesh, P(axis, None))
        put = lambda a: None if a is None else jax.device_put(a, spec)  # noqa: E731
    else:
        spec = NamedSharding(mesh, P(None, axis))
        put = lambda a: None if a is None else jax.device_put(a, spec)  # noqa: E731
    return QuantLinear(
        codes=put(w.codes), d=put(w.d), sc=put(w.sc), dmin=put(w.dmin),
        mn=put(w.mn), fmt=w.fmt, bits=w.bits, sub_size=w.sub_size,
        d_size=w.d_size, code_bias=w.code_bias,
        out_features=w.out_features, in_features=w.in_features,
    )


def _device_put_tree(tree, sharding: NamedSharding):
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def _row_parallel(w, mesh: Mesh):
    """Row-parallel placement: the explicit-overlap path
    (``LGT_TP_OVERLAP=1`` — per-shard repacked stack + shard_map ring
    all-reduce, parallel.overlap) when eligible, else the GSPMD default."""
    from ..ops.linear import LoraLinear
    from .overlap import make_row_parallel, overlap_enabled
    tp = mesh.shape[AXIS_TP]
    if (overlap_enabled() and tp > 1 and mesh.shape[AXIS_DP] == 1
            and not isinstance(w, LoraLinear)
            # mixed scale layout: the min side keeps 256-element
            # super-block granularity that stack_row_shards' flat-chunk
            # re-index does not cover — those weights stay on GSPMD psum
            and not getattr(w, "min_size", 0)
            and shard_decision(w.out_features, w.in_features, 1, tp,
                               _block_multiple(w))):
        return make_row_parallel(w, mesh)
    return _shard_linear(w, mesh, AXIS_TP, 1)


def stack_experts(experts: list[dict[str, Any]], role: str):
    """Stack one expert role (gate/up/down) across all experts: each array
    field gains a leading (E,) axis.  Static geometry must match across
    experts (same GGUF quant type per role — guaranteed by the converter)."""
    import jax.numpy as jnp
    ws = [ex[role] for ex in experts]
    w0 = ws[0]
    if isinstance(w0, DenseLinear):
        return DenseLinear(w=jnp.stack([w.w for w in ws]),
                           out_features=w0.out_features,
                           in_features=w0.in_features)

    def cat(field):
        vals = [getattr(w, field) for w in ws]
        if vals[0] is None:
            return None
        return jnp.stack(vals)

    import dataclasses as _dc
    return _dc.replace(w0, codes=cat("codes"), d=cat("d"), sc=cat("sc"),
                       dmin=cat("dmin"), mn=cat("mn"))


def _shard_experts_ep(experts: list[dict[str, Any]], mesh: Mesh):
    """Stacked expert weights, expert axis sharded over tp (parallel.ep)."""
    out = {}
    for role in ("ffn_gate", "ffn_up", "ffn_down"):
        st = stack_experts(experts, role)
        spec = NamedSharding(mesh, P(AXIS_TP))
        out[role] = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, spec), st)
    return out


def shard_params(params: dict[str, Any], cfg: ModelConfig, mesh: Mesh) -> dict[str, Any]:
    """Place a loaded params pytree onto the mesh with TP rules."""
    rep = NamedSharding(mesh, P())
    out: dict[str, Any] = {
        # embedding table is gathered (not matmul'd): replicate
        "tok_embd": jax.device_put(params["tok_embd"], rep),
        "output_norm": jax.device_put(params["output_norm"], rep),
        # output head: column-parallel over vocab
        "output": _shard_linear(params["output"], mesh, AXIS_TP, 0),
    }
    # top-level extras (phi3 rope factor tensors): replicate
    for key, val in params.items():
        if key not in out and key != "layers":
            out[key] = _device_put_tree(val, rep)

    layers = []
    for layer in params["layers"]:
        new: dict[str, Any] = {
            "attn_output": _row_parallel(layer["attn_output"], mesh),
        }
        # pre-norms are optional (olmo2 ships post-norms only; command-r
        # has a single shared pre-norm) — the catch-all below replicates
        # whatever norm vectors the layer actually carries
        if "attn_kv_a_mqa" in layer:
            # deepseek2 MLA: per-head projections column-parallel over the
            # head axis; the small latent projections (kv_a, q_a) replicate
            if "attn_q" in layer:
                new["attn_q"] = _shard_linear(layer["attn_q"], mesh, AXIS_TP, 0)
            else:
                new["attn_q_a"] = _device_put_tree(layer["attn_q_a"], rep)
                new["attn_q_b"] = _shard_linear(layer["attn_q_b"], mesh,
                                                AXIS_TP, 0)
            new["attn_kv_a_mqa"] = _device_put_tree(layer["attn_kv_a_mqa"], rep)
            # absorbed kv_b halves: (H, dn|dv, C) — shard the head axis
            tp_div = cfg.n_heads % mesh.shape[AXIS_TP] == 0
            head_spec = NamedSharding(
                mesh, P(AXIS_TP if tp_div else None, None, None))
            new["attn_kv_b_k"] = jax.device_put(layer["attn_kv_b_k"], head_spec)
            new["attn_kv_b_v"] = jax.device_put(layer["attn_kv_b_v"], head_spec)
        elif "attn_qkv" in layer:
            # phi3 pre-fused QKV: out-axis sharding crosses the q/k/v
            # boundaries — XLA reshards at the split, correctness intact
            new["attn_qkv"] = _shard_linear(layer["attn_qkv"], mesh, AXIS_TP, 0)
        else:
            new["attn_q"] = _shard_linear(layer["attn_q"], mesh, AXIS_TP, 0)
            new["attn_k"] = _shard_linear(layer["attn_k"], mesh, AXIS_TP, 0)
            new["attn_v"] = _shard_linear(layer["attn_v"], mesh, AXIS_TP, 0)
        if "experts" in layer:
            new["ffn_gate_inp"] = _device_put_tree(layer["ffn_gate_inp"], rep)
            if "shared_experts" in layer:
                # always-on experts (deepseek2/qwen2moe) shard like a dense
                # FFN: gate/up column-, down row-parallel; the qwen2moe
                # sigmoid gate (dim -> 1) replicates via the generic pass
                new["shared_experts"] = {
                    "ffn_gate": _shard_linear(
                        layer["shared_experts"]["ffn_gate"], mesh, AXIS_TP, 0),
                    "ffn_up": _shard_linear(
                        layer["shared_experts"]["ffn_up"], mesh, AXIS_TP, 0),
                    "ffn_down": _shard_linear(
                        layer["shared_experts"]["ffn_down"], mesh, AXIS_TP, 1),
                }
            tp = mesh.shape[AXIS_TP]
            import os
            if (tp > 1 and cfg.n_experts % tp == 0
                    and not os.environ.get("LGT_NO_EP")):
                # expert parallelism: whole experts sharded over tp, tokens
                # replicated, psum combine (parallel.ep)
                from .ep import set_ep_mesh
                set_ep_mesh(mesh)
                new["experts_ep"] = _shard_experts_ep(layer["experts"], mesh)
            else:
                # EP-lite fallback (tp doesn't divide E): router replicated,
                # experts TP-sharded like dense FFN
                new["experts"] = [
                    {
                        "ffn_gate": _shard_linear(ex["ffn_gate"], mesh, AXIS_TP, 0),
                        "ffn_up": _shard_linear(ex["ffn_up"], mesh, AXIS_TP, 0),
                        "ffn_down": _shard_linear(ex["ffn_down"], mesh, AXIS_TP, 1),
                    }
                    for ex in layer["experts"]
                ]
        elif "ffn_gateup" in layer:
            new["ffn_gateup"] = _shard_linear(layer["ffn_gateup"], mesh, AXIS_TP, 0)
            new["ffn_down"] = _row_parallel(layer["ffn_down"], mesh)
        elif "ffn_gate" in layer:
            new["ffn_gate"] = _shard_linear(layer["ffn_gate"], mesh, AXIS_TP, 0)
            new["ffn_up"] = _shard_linear(layer["ffn_up"], mesh, AXIS_TP, 0)
            new["ffn_down"] = _row_parallel(layer["ffn_down"], mesh)
        else:   # plain MLP (starcoder2): up column-, down row-parallel
            new["ffn_up"] = _shard_linear(layer["ffn_up"], mesh, AXIS_TP, 0)
            new["ffn_down"] = _row_parallel(layer["ffn_down"], mesh)
        # per-arch extras (qwen2 biases, qwen3 q/k norms, gemma2 post-norms):
        # small 1-D vectors — replicate.  A generic pass so new optional
        # tensors can never be silently dropped from the sharded pytree.
        for key, val in layer.items():
            if key not in new and key != "experts":
                new[key] = _device_put_tree(val, rep)
        layers.append(new)
    out["layers"] = layers
    return out


def cache_sharding(mesh: Mesh, n_kv_heads: int | None = None,
                   batch: int | None = None) -> NamedSharding:
    """KV cache leaves (B, H, S, D) per layer: batch over dp, kv heads over
    tp.  Axes that don't divide evenly (GQA models have few KV heads) fall
    back to replication on that axis.
    """
    h_axis = AXIS_TP if (n_kv_heads is None or
                         n_kv_heads % mesh.shape[AXIS_TP] == 0) else None
    b_axis = AXIS_DP if (batch is None or
                         batch % mesh.shape[AXIS_DP] == 0) else None
    return NamedSharding(mesh, P(b_axis, h_axis, None, None))


def shard_cache(cache, mesh: Mesh, n_kv_heads: int | None = None,
                batch: int | None = None):
    """Place a KV cache pytree on the mesh, rank-aware per leaf.

    bf16 KVCache leaves are (B, H, S, D); QuantKV scale leaves are
    (B, H, S) — the per-(token, head) f32 scales — so the PartitionSpec is
    trimmed to each leaf's rank.
    """
    h_axis = AXIS_TP if (n_kv_heads is None or
                         n_kv_heads % mesh.shape[AXIS_TP] == 0) else None
    b_axis = AXIS_DP if (batch is None or
                         batch % mesh.shape[AXIS_DP] == 0) else None

    from ..runtime.paged_kv import PagedKV, PagedQuantKV
    if isinstance(cache, (PagedKV, PagedQuantKV)):
        # pools are (P, KVH, page_s, ...): the PAGE axis is global (pages
        # assign to any slot) so only KV heads shard; the tiny page table
        # replicates (the paged flash kernels' shard_map declares it so —
        # the generic branch below would tp-shard it and crash whenever
        # pool_pages % tp != 0).  dp batch sharding is unsound for a
        # shared pool — the engine restricts paged layouts to dp == 1.
        rep = NamedSharding(mesh, P())

        def put_pool(leaf):
            spec = (None, h_axis, None, None)[:leaf.ndim]
            return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

        fields = {f: jax.tree_util.tree_map(put_pool, getattr(cache, f))
                  for f in type(cache)._fields if f != "page_table"}
        return cache._replace(
            page_table=jax.device_put(cache.page_table, rep), **fields)

    def put(leaf):
        spec = (b_axis, h_axis, None, None)[:leaf.ndim]
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, cache)


def batch_sharding(mesh: Mesh, batch: int | None = None) -> NamedSharding:
    """(B, ...) request tensors: batch over dp."""
    if batch is not None and batch % mesh.shape[AXIS_DP] != 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(AXIS_DP))
