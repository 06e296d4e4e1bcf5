"""Expert parallelism: Mixtral experts sharded over the mesh's tp axis.

The reference serves Mixtral-8x7B transparently through its llama.cpp
backend (BASELINE config 4); the TPU-native design shards the quantized
expert weights so each tp rank holds E/tp whole experts (SURVEY.md §2.13 EP
row).  Token routing here is the replicate-and-reduce formulation rather
than a literal all-to-all: serving batches are small (a few tokens per
decode step), so activations are replicated across the tp axis — already
true after attention's row-parallel psum — each rank runs only its LOCAL
experts on the tokens routed to them (``lax.cond``-gated, so unrouted
experts cost neither FLOPs nor weight HBM traffic), and one ``psum``
combines the expert outputs over ICI.  With E/tp experts per rank the
weight traffic per rank scales as k/E of the dense formulation, and the
collective volume equals the row-parallel FFN the dense model would do —
the all-to-all degenerates to this exact pattern when tokens are
replicated.

Weights arrive STACKED: each expert role (gate/up/down) is one
QuantLinear/DenseLinear whose arrays carry a leading (E,) axis sharded with
``PartitionSpec('tp')`` (parallel.partition.stack_experts).  shard_map
slices that axis so each rank sees its local (E/tp, ...) block; static
geometry (format, bits, block sizes) rides on the dataclass unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.config import ModelConfig
from .mesh import AXIS_TP

# one engine per process owns one mesh; shard_params registers it here so
# the model graph (which never sees the mesh) can enter shard_map
_EP_STATE: dict[str, Mesh | None] = {"mesh": None}


def set_ep_mesh(mesh: Mesh | None) -> None:
    _EP_STATE["mesh"] = mesh


def _expert_view(stacked, j: int):
    """Slice local expert ``j`` out of a stacked linear container."""
    sl = {f.name: (None if getattr(stacked, f.name) is None
                   else getattr(stacked, f.name)[j])
          for f in dataclasses.fields(stacked)
          if f.metadata.get("pytree", True)}
    return dataclasses.replace(stacked, **sl)


def moe_ep(layer: dict[str, Any], cfg: ModelConfig, x: jax.Array,
           w_exp: jax.Array) -> jax.Array:
    """EP-sharded MoE block: x (B, T, D) replicated, w_exp (B, T, E)."""
    from ..models.llama import ffn_swiglu

    mesh = _EP_STATE["mesh"]
    if mesh is None:
        raise RuntimeError("experts_ep present but no EP mesh registered")
    tp = mesh.shape[AXIS_TP]
    e_local = cfg.n_experts // tp
    st = layer["experts_ep"]

    def local_fn(x_l, w_l, st_l):
        # x_l (B, T, D) full; w_l (B, T, E/tp) local; st_l local expert stack
        out = jnp.zeros(x_l.shape[:2] + (x_l.shape[2],), jnp.float32)
        # mark the accumulator as device-varying over tp so both lax.cond
        # branches carry identical varying-axes types (the expert branch
        # depends on tp-sharded operands)
        out = jax.lax.pvary(out, (AXIS_TP,))
        zero = jnp.zeros_like(out)
        for j in range(e_local):
            ex = {role: _expert_view(st_l[role], j)
                  for role in ("ffn_gate", "ffn_up", "ffn_down")}
            we = w_l[..., j:j + 1]

            def run(ex=ex, we=we):
                return ffn_swiglu(ex, x_l).astype(jnp.float32) * we

            out = out + jax.lax.cond(jnp.any(we > 0), run, lambda: zero)
        return jax.lax.psum(out, AXIS_TP)

    spec_st = jax.tree_util.tree_map(lambda _: P(AXIS_TP), st)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, None, AXIS_TP), spec_st),
        out_specs=P(),
    )
    return fn(x, w_exp, st).astype(x.dtype)
