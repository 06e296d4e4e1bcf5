"""70B tensor-sharding validation + v5e-16 weak-scaling projection.

BASELINE config 5 ("Llama-3-70B Q4_K_M tensor-sharded on v5e-16,
weak-scaling >= 80%") cannot be *run* here — the environment has one v5e
chip — so this module provides the three artifacts that de-risk it
(VERDICT r3 #3):

1. :func:`shard_plan` — applies the REAL partition rules
   (``partition.shard_decision``, the same function ``shard_params`` calls)
   to the real 70B tensor shapes, with zero bytes allocated.  Catches
   block-divisibility violations (the classic 70B failure: a row-parallel
   shard boundary splitting a 256-element K-quant super-block) today.
2. :func:`project_v5e` — an analytic decode-step model: per-chip HBM
   streaming time vs ICI collective time for Megatron-style TP, following
   the public scaling-book recipe (count bytes each subsystem must move;
   divide by its bandwidth; add per-collective latency).
3. :func:`weak_scaling_run` — a measured harness on a virtual CPU mesh:
   per-device work held fixed while devices scale 1 -> N (ffn_dim grows
   with N, row-sharded), timing the jitted sharded step.  On virtual CPU
   devices the absolute numbers measure host-thread contention, not ICI —
   the harness exists so the same code can run unchanged on a real pod
   slice; the *projection* above carries the v5e-16 claim.

v5e constants (public: cloud.google.com/tpu/docs/v5e, and the
jax-ml.github.io/scaling-book tables):
- HBM bandwidth 819 GB/s/chip.
- ICI: 2D torus, 4 links/chip at ~45 GB/s one-way each.  A bidirectional
  ring all-reduce over a 4x4 slice sustains ~2 links per chip ->
  ~90 GB/s of bus bandwidth; per-collective launch/hop latency is ~1 us
  x O(ring length).  Both are encoded as explicit constants below so the
  projection is auditable.
"""

from __future__ import annotations

import dataclasses
import time

from .partition import shard_decision

V5E_HBM_GBS = 819.0
V5E_ICI_BUS_GBS = 90.0        # effective all-reduce bus bandwidth per chip
V5E_ICI_LATENCY_S = 0.5e-6    # per-hop latency (conservative: public ICI
#                               microbenchmarks put small-message hops at a
#                               few hundred ns)
QK_K = 256                    # K-quant super-block (row-shard granularity)


@dataclasses.dataclass(frozen=True)
class LlamaShapes:
    """Decoder tensor shapes for a llama-family model."""

    name: str
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    ffn_dim: int
    vocab: int

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    def weights(self) -> list[tuple[str, int, int, int]]:
        """(name, out_features, in_features, shard_dim) per weight matrix.

        shard_dim follows partition.shard_params: 0 = column-parallel
        (q/k/v, gate/up, output head), 1 = row-parallel (attn_output,
        ffn_down).
        """
        kv = self.n_kv_heads * self.head_dim
        per_layer = [
            ("attn_q", self.dim, self.dim, 0),
            ("attn_k", kv, self.dim, 0),
            ("attn_v", kv, self.dim, 0),
            ("attn_output", self.dim, self.dim, 1),
            ("ffn_gate", self.ffn_dim, self.dim, 0),
            ("ffn_up", self.ffn_dim, self.dim, 0),
            ("ffn_down", self.dim, self.ffn_dim, 1),
        ]
        out = [(f"blk.{i}.{n}", o, i_, d)
               for i in range(self.n_layers) for n, o, i_, d in per_layer]
        out.append(("output", self.vocab, self.dim, 0))
        return out


# Llama-3-70B (HF config: 80 layers, GQA 64/8, ffn 28672, vocab 128256)
LLAMA3_70B = LlamaShapes(name="llama3-70b", dim=8192, n_layers=80,
                         n_heads=64, n_kv_heads=8, ffn_dim=28672,
                         vocab=128256)
# Llama-3-8B, for cross-checking the model against measured single-chip data
LLAMA3_8B = LlamaShapes(name="llama3-8b", dim=4096, n_layers=32,
                        n_heads=32, n_kv_heads=8, ffn_dim=14336,
                        vocab=128256)


def shard_plan(shapes: LlamaShapes, tp: int, blk: int = QK_K) -> dict:
    """Validate every weight's TP placement at real shapes, zero bytes.

    Returns {"sharded": [...], "replicated": [(name, reason), ...],
    "kv_heads_shard": bool}.  Production health = big tensors all shard.
    """
    sharded, replicated = [], []
    for name, out_f, in_f, dim in shapes.weights():
        if shard_decision(out_f, in_f, dim, tp, blk if dim == 1 else 1):
            sharded.append(name)
        else:
            size = out_f if dim == 0 else in_f
            if size % tp:
                reason = f"axis {size} % tp {tp} != 0"
            else:
                reason = (f"in/tp = {in_f // tp} splits the {blk}-elem "
                          "super-block")
            replicated.append((name, reason))
    return {
        "sharded": sharded,
        "replicated": replicated,
        # GQA: KV cache shards its head axis only when kv_heads % tp == 0
        # (partition.cache_sharding); at tp > kv_heads the pod should use
        # tp=kv_heads x dp/sp for the KV axis instead
        "kv_heads_shard": shapes.n_kv_heads % tp == 0,
    }


def packed_weight_bytes(shapes: LlamaShapes, bpw: float = 6.0) -> float:
    """Total decode-streamed weight bytes at ``bpw`` bits per weight.

    Default 6.0 = the measured Q4_K device layout under the ``auto`` scale
    policy (4-bit codes + flat f32 scale/min per 32 = 6 bpw; cross-check:
    6 bpw over this 8B shape list + the 8.5-bpw q6_k head = 5.79 GB,
    matching BENCH_r03's measured 5.80 GB streamed bytes).
    """
    total = sum(o * i for _, o, i, _ in shapes.weights())
    return total * bpw / 8


def project_v5e(shapes: LlamaShapes, tp: int, batch: int = 1,
                bpw: float = 6.0) -> dict:
    """Analytic batch-``batch`` decode step on a v5e slice, TP over ICI.

    Per step and chip:
    - HBM: packed_bytes / tp streamed once (decode is bandwidth-bound —
      measured 87.9% of this roofline single-chip in BENCH_r03).
    - ICI: Megatron TP runs TWO all-reduces per layer on the (B, dim)
      bf16 activations (attn output psum + ffn_down psum) plus ONE
      all-gather of the (B, vocab/tp) logits for the sampler.  Ring
      all-reduce moves 2*(N-1)/N * bytes through each chip's bus
      (bandwidth-tiny at batch 1) and pays ~2*(N-1) sequential hop
      latencies (the REAL cost at batch 1: 160 collectives/step on 70B).

    Overlap: a collective's result gates the next MXU consumption, but
    the next layer's HBM->VMEM weight prefetch is data-independent of it,
    so a double-buffered schedule hides collectives under weight
    streaming.  Both bounds are reported — ``t_step_ms`` (no overlap,
    pessimistic) and ``t_step_overlap_ms`` (full overlap: max of the two
    streams) — with efficiencies for each; the truth on real hardware
    lands between them (XLA's latency-hiding scheduler does overlap
    collectives with independent work).

    ``scaling_efficiency`` = t_hbm(whole model, 1 chip) / (tp * t_step):
    how close the slice comes to tp perfect single-chip rooflines — the
    BASELINE ">= 80% weak-scaling" metric.
    """
    total_bytes = packed_weight_bytes(shapes, bpw)
    t_hbm_1 = total_bytes / (V5E_HBM_GBS * 1e9)
    t_hbm = t_hbm_1 / tp

    ar_bytes = batch * shapes.dim * 2               # bf16 activations
    ag_bytes = batch * shapes.vocab * 2
    n_ar = 2 * shapes.n_layers
    if tp == 1:
        t_coll = 0.0
    else:
        ring = 2 * (tp - 1) / tp
        t_ar = ar_bytes * ring / (V5E_ICI_BUS_GBS * 1e9) \
            + 2 * (tp - 1) * V5E_ICI_LATENCY_S
        t_ag = ag_bytes * ((tp - 1) / tp) / (V5E_ICI_BUS_GBS * 1e9) \
            + 2 * (tp - 1) * V5E_ICI_LATENCY_S
        t_coll = n_ar * t_ar + t_ag
    t_step = t_hbm + t_coll

    # Pipelined-ring floor (the SHIPPED overlap path, not a hope): the
    # explicit row-parallel ring (parallel.overlap, LGT_TP_OVERLAP=1)
    # splits each all-reduce into LGT_TP_CHUNKS output chunks whose ring
    # stages are data-independent of later chunks' matmuls — all-reduce is
    # linear over output slices — so a latency-hiding schedule exposes
    # only ~1/C of each collective (the final chunk's tail) plus the
    # pipeline fill.  tests/test_tp_overlap.py pins the compiled module
    # actually interleaving ring stages with later chunk compute; this
    # bound assumes nothing beyond that pinned structure.
    from .overlap import overlap_chunks
    C = overlap_chunks()
    fill = 0.0 if tp == 1 else n_ar * (C - 1) * V5E_ICI_LATENCY_S
    t_chunked = t_hbm + t_coll / C + fill
    t_overlap = max(t_hbm, t_coll)
    return {
        "model": shapes.name, "tp": tp, "batch": batch,
        "weight_gb": round(total_bytes / 1e9, 2),
        "t_hbm_ms": round(t_hbm * 1e3, 3),
        "t_coll_ms": round(t_coll * 1e3, 3),
        "t_step_ms": round(t_step * 1e3, 3),
        "t_step_chunked_ms": round(t_chunked * 1e3, 3),
        "t_step_overlap_ms": round(t_overlap * 1e3, 3),
        "overlap_chunks": C,
        "tok_s": round(batch / t_step, 1),
        "tok_s_chunked": round(batch / t_chunked, 1),
        "tok_s_overlap": round(batch / t_overlap, 1),
        "scaling_efficiency_pct": round(100 * t_hbm_1 / (tp * t_step), 1),
        "scaling_efficiency_chunked_pct":
            round(100 * t_hbm_1 / (tp * t_chunked), 1),
        "scaling_efficiency_overlap_pct":
            round(100 * t_hbm_1 / (tp * t_overlap), 1),
        "comm_overhead_pct": round(100 * t_coll / t_step, 1),
    }


@dataclasses.dataclass(frozen=True)
class MoEShapes:
    """Mixtral-style MoE decoder shapes (dense attention + routed FFN)."""

    name: str
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    ffn_dim: int
    vocab: int
    n_experts: int
    n_experts_used: int

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


# Mixtral-8x7B (HF config: 32 layers, GQA 32/8, ffn 14336, 8 experts top-2)
MIXTRAL_8X7B = MoEShapes(name="mixtral-8x7b", dim=4096, n_layers=32,
                         n_heads=32, n_kv_heads=8, ffn_dim=14336,
                         vocab=32000, n_experts=8, n_experts_used=2)


def moe_plan(shapes: MoEShapes, tp: int, bpw: float = 6.0,
             kv_slots: int = 8, ctx: int = 16384, kv_bytes: float = 1.0625,
             hbm_gb: float = 16.0) -> dict:
    """Capacity + decode plan for an MoE model on a v5e slice (BASELINE
    config 4 at scale; VERDICT r4 #8).

    Sharding model = the engine's real one (parallel.ep): attention /
    norms / router / head tensor-parallel via ``shard_decision``; the
    stacked expert FFNs shard one-group-per-rank on the leading expert
    axis (requires n_experts % tp == 0), so each chip holds E/tp whole
    experts — expert weights never split a super-block by construction.
    Decode streams attention/tp plus only the ROUTED k experts
    (cond-gated, runtime.engine), so the per-step roofline uses
    attn/tp + experts*(k/E)/tp active bytes.  kv_bytes: 2 = bf16,
    1.0625 = q8_0 (the measured config-4 serving mode).
    """
    kv = shapes.n_kv_heads * shapes.head_dim
    attn_per_layer = (shapes.dim * shapes.dim + 2 * kv * shapes.dim
                      + shapes.dim * shapes.dim)
    router_per_layer = shapes.n_experts * shapes.dim
    expert_per_layer = 3 * shapes.ffn_dim * shapes.dim * shapes.n_experts
    dense = (attn_per_layer + router_per_layer) * shapes.n_layers \
        + shapes.vocab * shapes.dim * 2          # embed + head
    experts = expert_per_layer * shapes.n_layers
    dense_b = dense * bpw / 8
    experts_b = experts * bpw / 8

    ok_experts = shapes.n_experts % tp == 0
    plan = shard_plan(LlamaShapes(
        name=shapes.name, dim=shapes.dim, n_layers=shapes.n_layers,
        n_heads=shapes.n_heads, n_kv_heads=shapes.n_kv_heads,
        ffn_dim=shapes.ffn_dim, vocab=shapes.vocab), tp)

    per_chip_weights = (dense_b + experts_b) / tp
    kv_pool = (kv_slots * ctx * shapes.n_layers * shapes.n_kv_heads
               * shapes.head_dim * 2 * kv_bytes) / tp
    k_frac = shapes.n_experts_used / shapes.n_experts
    active_b = (dense_b - shapes.vocab * shapes.dim * bpw / 8   # embed gathers
                + experts_b * k_frac) / tp
    t_step = active_b / (V5E_HBM_GBS * 1e9)
    return {
        "model": shapes.name, "tp": tp,
        "experts_shard": ok_experts,
        "experts_per_chip": shapes.n_experts // tp if ok_experts else None,
        "attn_replicated": plan["replicated"],
        "kv_heads_shard": shapes.n_kv_heads % tp == 0,
        "resident_gb_per_chip": round(per_chip_weights / 1e9, 2),
        "kv_pool_gb_per_chip": round(kv_pool / 1e9, 2),
        "fits_hbm": (per_chip_weights + kv_pool) / 1e9 < hbm_gb - 1.5,
        "active_gb_per_step_per_chip": round(active_b / 1e9, 2),
        "roofline_tok_s_no_comm": round(1.0 / t_step, 1),
    }


def weak_scaling_run(n_list: list[int], devices=None, dim: int = 256,
                     steps: int = 8) -> dict[int, float]:
    """Measured sharded-step times with per-device work held fixed.

    For each N: a (1, tp=N) mesh, a dense (dim, N*dim) column-sharded +
    (N*dim, dim) row-sharded matmul pair with a psum (the Megatron layer
    skeleton), per-device bytes constant.  Returns {N: seconds/step}.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = list(devices if devices is not None else jax.devices())
    out: dict[int, float] = {}
    for n in n_list:
        mesh = Mesh(np.array(devices[:n]).reshape(n,), ("tp",))
        rng = np.random.default_rng(0)
        w_up = jnp.asarray(rng.standard_normal((n * dim, dim)),
                           jnp.float32)
        w_down = jnp.asarray(rng.standard_normal((dim, n * dim)),
                             jnp.float32)
        x = jnp.asarray(rng.standard_normal((8, dim)), jnp.float32)
        w_up = jax.device_put(w_up, NamedSharding(mesh, P("tp", None)))
        w_down = jax.device_put(w_down, NamedSharding(mesh, P(None, "tp")))
        x = jax.device_put(x, NamedSharding(mesh, P()))

        @jax.jit
        def chain(wu, wd, x0):
            def body(c, _):
                h = c @ wu.T          # column-parallel: h sharded on feature
                y = h @ wd.T          # row-parallel: psum inserted by XLA
                return y * 1e-3, None
            c, _ = jax.lax.scan(body, x0, None, length=steps)
            return c

        chain(w_up, w_down, x).block_until_ready()   # compile
        t0 = time.perf_counter()
        chain(w_up, w_down, x).block_until_ready()
        out[n] = (time.perf_counter() - t0) / steps
    return out
