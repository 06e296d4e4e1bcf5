"""70B tensor-sharding validation + weak-scaling artifacts (BASELINE
config 5; VERDICT r3 #3).  No real pod here — these pin the shape-level
rules and the harness/projection machinery."""

import numpy as np
import pytest

from llama_gguf_inference_tpu.parallel.partition import shard_decision
from llama_gguf_inference_tpu.parallel.scaling import (
    LLAMA3_8B,
    LLAMA3_70B,
    LlamaShapes,
    packed_weight_bytes,
    project_v5e,
    shard_plan,
    weak_scaling_run,
)


def test_shard_decision_rules():
    # column-parallel: only out divisibility matters
    assert shard_decision(8192, 8192, 0, 16)
    assert not shard_decision(100, 8192, 0, 16)
    # row-parallel: shard must keep 256-elem super-blocks intact
    assert shard_decision(8192, 28672, 1, 16, blk=256)     # 1792 % 256 == 0
    assert shard_decision(8192, 4096, 1, 16, blk=256)      # 256 exactly
    assert not shard_decision(8192, 2048, 1, 16, blk=256)  # 128 splits block
    assert shard_decision(8192, 2048, 1, 8, blk=256)       # 256 ok


def test_llama70b_all_weights_shard_tp8_tp16():
    """The named BASELINE config: every 70B weight matrix must shard at
    tp=8 and tp=16 under the real partition rules — zero replicated
    fallbacks (each would multiply that tensor's HBM traffic by tp)."""
    for tp in (8, 16):
        plan = shard_plan(LLAMA3_70B, tp)
        assert plan["replicated"] == [], (tp, plan["replicated"][:5])
        assert len(plan["sharded"]) == 80 * 7 + 1
    # GQA-8 KV cache: head axis shards at tp=8, NOT at tp=16 — the
    # documented v5e-16 layout is therefore tp=8 x dp=2
    assert shard_plan(LLAMA3_70B, 8)["kv_heads_shard"]
    assert not shard_plan(LLAMA3_70B, 16)["kv_heads_shard"]


def test_shard_plan_flags_violations():
    bad = LlamaShapes(name="bad", dim=4000, n_layers=1, n_heads=8,
                      n_kv_heads=4, ffn_dim=6000, vocab=100)
    plan = shard_plan(bad, 16)
    names = [n for n, _ in plan["replicated"]]
    assert any("ffn_down" in n for n in names)      # 6000/16 = 375 not *256
    assert any("output" in n for n in names)        # 100 % 16 != 0
    reasons = dict(plan["replicated"])
    assert "super-block" in reasons["blk.0.ffn_down"]


def test_projection_sanity():
    """The analytic model must bracket the MEASURED single-chip 8B
    number: pure HBM roofline above the measured 105 tok/s, and the
    measured value at >= 70% of it (BENCH_r03 measured 87.9% of its own
    roofline; the model's default bpw reproduces the measured stream
    bytes within 3%)."""
    p = project_v5e(LLAMA3_8B, tp=1)
    assert p["tok_s"] > 105 > 0.7 * p["tok_s"]
    assert abs(p["weight_gb"] - 5.80) / 5.80 < 0.05

    p8 = project_v5e(LLAMA3_70B, tp=8)
    p16 = project_v5e(LLAMA3_70B, tp=16)
    # the BASELINE >= 80% weak-scaling target: tp=8 clears it even on the
    # pessimistic (no collective/DMA overlap) bound
    assert p8["scaling_efficiency_pct"] >= 80.0
    assert p8["tok_s"] > 100
    # tp=16 needs overlap (XLA hides collectives under weight prefetch)
    assert p16["scaling_efficiency_overlap_pct"] >= 80.0
    assert p16["t_coll_ms"] > p8["t_coll_ms"]
    # 70B Q4_K ~ 52 GB packed: fits 16 x 16 GB with room for KV
    assert 45 < packed_weight_bytes(LLAMA3_70B) / 1e9 < 60


@pytest.mark.parametrize("n", [2, 4])
def test_weak_scaling_harness_runs(n):
    """The measured harness executes on a virtual mesh and returns
    per-step times; on CPU the numbers measure host contention, so only
    shape/positivity is asserted."""
    import jax
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    times = weak_scaling_run([1, n], dim=128, steps=4)
    assert set(times) == {1, n}
    assert all(t > 0 and np.isfinite(t) for t in times.values())


def test_mixtral_moe_plan_tp4():
    """BASELINE config-4-at-scale capacity plan (VERDICT r4 #8): true
    Mixtral-8x7B shapes, engine sharding rules, v5e-4 must fit."""
    from llama_gguf_inference_tpu.parallel.scaling import (
        MIXTRAL_8X7B, moe_plan,
    )
    p4 = moe_plan(MIXTRAL_8X7B, tp=4)
    assert p4["experts_shard"] and p4["experts_per_chip"] == 2
    assert p4["attn_replicated"] == []
    assert p4["kv_heads_shard"]
    assert p4["fits_hbm"], p4
    # routed top-2 of 8: active decode bytes well under resident
    assert p4["active_gb_per_step_per_chip"] < p4["resident_gb_per_chip"] / 2
    p3 = moe_plan(MIXTRAL_8X7B, tp=3)
    assert not p3["experts_shard"]        # 8 % 3 != 0 -> EP cannot stack
