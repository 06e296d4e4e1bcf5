"""Pipeline parallelism: stage-stacked layers + microbatched GPipe forward.

SURVEY.md §2.13 marks PP "not required for parity" (llama.cpp has no model
parallelism at all); this module builds it anyway for the workloads where
it earns its keep on TPU pods: prefill / batch-scoring throughput and
fitting models whose per-chip share exceeds HBM under tp alone (70B-class
on small slices).  Decode latency at batch 1 gains nothing from PP — the
token recurrence serializes stages — so the serving engine keeps tp/dp
for decode and PP is exposed as a forward-pass primitive.

TPU-native shape of the thing:

- **Stage-stacked parameters** (:func:`stack_stage_layers`): the L layer
  pytrees are split into ``pp`` contiguous stages and stacked leaf-wise
  into arrays with a leading ``(pp, L/pp)`` axis pair; the ``pp`` axis
  shards one-stage-per-rank over the mesh (the same stacking trick as
  expert parallelism's ``experts_st``, parallel/ep.py).  Inside
  ``shard_map`` each rank scans its ``(L/pp,)`` slice — layers within a
  stage run as a ``lax.scan`` over the stacked params, so one compiled
  block serves every layer.
- **GPipe schedule** (:func:`pp_forward`): the batch splits into
  ``n_micro`` microbatches; at tick t, stage s processes microbatch
  ``t - s`` while ``ppermute`` hands its previous activation to stage
  s+1 — ``n_micro + pp - 1`` ticks total, pipeline utilization
  ``n_micro / (n_micro + pp - 1)``.  Activations are the only cross-stage
  traffic: (mb, T, dim) bf16 per hop per tick over ICI.
- Embedding and LM head are gated by ``lax.axis_index``: stage 0 embeds,
  the last stage norms + projects; the masked ``psum`` at the end
  replicates each microbatch's logits to every rank (their contribution
  is zero elsewhere).

The layer block mirrors models.llama.attention/ffn for the llama family
(pre-norm attention with rope + causal softmax over the chunk, gated
SiLU FFN) through the SAME ``ops.linear.matmul`` weights — parity with
``models.llama.forward`` is pinned by tests/test_pp.py.  Heterogeneous
architectures (per-layer SWA interleave, MoE blocks) are rejected at
stacking time rather than silently mis-stacked.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import apply_rope, rms_norm, rope_angles
from ..ops.linear import matmul

AXIS_PP = "pp"


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:pp]
    return Mesh(np.array(devices), (AXIS_PP,))


_STACKABLE = ("attn_norm", "ffn_norm", "attn_q", "attn_k", "attn_v",
              "attn_qkv", "attn_output", "ffn_gate", "ffn_up", "ffn_down",
              "ffn_gateup")


def stack_stage_layers(layers: list[dict], pp: int):
    """L layer dicts -> one pytree whose leaves carry (pp, L/pp, ...).

    Every layer must expose the same keys with identical leaf shapes
    (homogeneous llama-family stacks); MoE / SWA-interleaved layers have
    per-layer structure and are rejected."""
    L = len(layers)
    if L % pp:
        raise ValueError(f"{L} layers do not split into {pp} stages")
    keys = set(layers[0])
    if any(set(ly) != keys for ly in layers[1:]):
        raise ValueError("heterogeneous layer stacks cannot pipeline "
                         "(per-layer structure differs)")
    if not keys.issubset(_STACKABLE):
        extra = keys - set(_STACKABLE)
        raise ValueError(f"unsupported layer fields for PP: {sorted(extra)}")
    per = L // pp

    def stack(*leaves):
        arr = jnp.stack(leaves)                       # (L, ...)
        return arr.reshape((pp, per) + arr.shape[1:])

    return jax.tree_util.tree_map(stack, *layers), per


def place_stage_stack(stacked, mesh: Mesh):
    """One stage per pp rank (leading axis), like EP's expert placement."""
    spec = NamedSharding(mesh, P(AXIS_PP))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), stacked)


def _layer_block(cfg, lp, h, cos, sin, mask):
    """One llama layer on a (mb, T, D) chunk — the models.llama block
    restricted to the homogeneous llama path (full causal attention)."""
    mb, T, _ = h.shape
    H, KVH, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
    if "attn_qkv" in lp:
        qkv = matmul(lp["attn_qkv"], x)
        q, k, v = jnp.split(qkv, [H * hd, (H + KVH) * hd], axis=-1)
    else:
        q = matmul(lp["attn_q"], x)
        k = matmul(lp["attn_k"], x)
        v = matmul(lp["attn_v"], x)
    q = q.reshape(mb, T, H, hd)
    k = k.reshape(mb, T, KVH, hd)
    v = v.reshape(mb, T, KVH, hd)
    q = apply_rope(q, cos, sin, cfg.rope_interleaved)
    k = apply_rope(k, cos, sin, cfg.rope_interleaved)
    group = H // KVH
    qh = q.reshape(mb, T, KVH, group, hd)
    scores = jnp.einsum("btkgd,bskd->bkgts", qh.astype(jnp.float32),
                        k.astype(jnp.float32)) / jnp.sqrt(float(hd))
    scores = jnp.where(mask[None, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bkgts,bskd->btkgd", probs, v.astype(jnp.float32))
    ctx = ctx.reshape(mb, T, H * hd).astype(h.dtype)
    h = h + matmul(lp["attn_output"], ctx).astype(h.dtype)
    x = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
    if "ffn_gateup" in lp:
        gu = matmul(lp["ffn_gateup"], x)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = matmul(lp["ffn_gate"], x)
        u = matmul(lp["ffn_up"], x)
    act = (jax.nn.silu(g.astype(jnp.float32))
           * u.astype(jnp.float32)).astype(h.dtype)
    return h + matmul(lp["ffn_down"], act).astype(h.dtype)


def pp_forward(params: dict, cfg, tokens: jax.Array, mesh: Mesh,
               n_micro: int) -> jax.Array:
    """Pipelined full-sequence forward: tokens (B, T) -> logits (B, T, V).

    B must split into ``n_micro`` microbatches; layers must split into
    ``pp`` stages (``stack_stage_layers``).  Returns replicated logits.
    """
    pp = mesh.shape[AXIS_PP]
    B, T = tokens.shape
    if B % n_micro:
        raise ValueError(f"batch {B} does not split into {n_micro} "
                         "microbatches")
    mb = B // n_micro
    stacked, per = stack_stage_layers(params["layers"], pp)
    stacked = place_stage_stack(stacked, mesh)

    positions = jnp.arange(T, dtype=jnp.int32)[None, :]
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_dim,
                           cfg.rope_base, cfg)
    mask = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])  # (T, S=T)

    from ..ops.linear import embed_lookup
    micros = tokens.reshape(n_micro, mb, T)

    rep = {"tok_embd": params["tok_embd"],
           "output_norm": params["output_norm"],
           "output": params["output"]}

    def run(stage_leaves, rep_p, micros_l, cos_l, sin_l, mask_l):
        sid = jax.lax.axis_index(AXIS_PP)
        perm_fwd = [(i, i + 1) for i in range(pp - 1)]

        def stage_apply(h):
            def body(carry, lp):
                return _layer_block(cfg, lp, carry, cos_l, sin_l,
                                    mask_l), None
            # drop the local (1,)-sized pp axis; scan over the stage layers
            local = jax.tree_util.tree_map(lambda a: a[0], stage_leaves)
            out, _ = jax.lax.scan(body, h, local)
            return out

        D = cfg.dim
        buf = jnp.zeros((mb, T, D), jnp.bfloat16)
        outs = jnp.zeros((n_micro, mb, T, cfg.vocab_size), jnp.float32)
        for t in range(n_micro + pp - 1):
            handed = jax.lax.ppermute(buf, AXIS_PP, perm_fwd) \
                if pp > 1 else buf
            m_in = min(t, n_micro - 1)
            fresh = embed_lookup(rep_p["tok_embd"], micros_l[m_in])
            fresh = fresh.astype(jnp.bfloat16)
            h = jnp.where(sid == 0,
                          fresh if t < n_micro else jnp.zeros_like(fresh),
                          handed)
            buf = stage_apply(h)
            m_out = t - (pp - 1)
            if 0 <= m_out < n_micro:
                x = rms_norm(buf, rep_p["output_norm"], cfg.rms_eps)
                logits = matmul(rep_p["output"], x).astype(jnp.float32)
                contrib = jnp.where(sid == pp - 1, logits,
                                    jnp.zeros_like(logits))
                outs = outs.at[m_out].set(contrib)
        # each microbatch's logits live on the last stage only: the masked
        # psum replicates them everywhere
        return jax.lax.psum(outs, AXIS_PP)

    spec_st = jax.tree_util.tree_map(lambda _: P(AXIS_PP), stacked)
    fn = shard_map(run, mesh=mesh,
                   in_specs=(spec_st, P(), P(), P(), P(), P()),
                   out_specs=P(), check_vma=False)
    out = fn(stacked, rep, micros, cos, sin, mask)
    return out.reshape(B, T, cfg.vocab_size)


def pipeline_utilization(n_micro: int, pp: int) -> float:
    """GPipe busy fraction: n_micro useful ticks of n_micro + pp - 1."""
    return n_micro / (n_micro + pp - 1)
