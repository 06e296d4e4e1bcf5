"""MoE routing tests: sparse paths vs the dense oracle, capacity drops, and
expert parallelism on the virtual 8-device CPU mesh (BASELINE config 4 /
SURVEY §2.13 EP row)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.models.llama import (
    KVCache, _moe_capacity, _moe_cond, _moe_dense, forward, moe_router,
)
from llama_gguf_inference_tpu.parallel.mesh import make_mesh
from llama_gguf_inference_tpu.parallel.partition import shard_params
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("m") / "moe.gguf"
    # E=4 experts, top-2; dim 128 shard-friendly on tp=4
    write_tiny_llama(p, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256, n_experts=4, n_experts_used=2,
                     quant=GGMLType.Q8_0)
    return load_model(p, mode="quant")


def _layer0(params):
    return params["layers"][0]


def test_cond_path_matches_dense_exactly(moe_model):
    cfg, params, _ = moe_model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2, cfg.dim)), jnp.bfloat16)
    layer = _layer0(params)
    w = moe_router(layer, cfg, x)
    dense = np.asarray(_moe_dense(layer, cfg, x, w), np.float32)
    cond = np.asarray(_moe_cond(layer, cfg, x, w), np.float32)
    np.testing.assert_array_equal(dense, cond)


def test_capacity_full_matches_dense(moe_model):
    cfg, params, _ = moe_model
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, cfg.dim)), jnp.bfloat16)
    layer = _layer0(params)
    w = moe_router(layer, cfg, x)
    dense = np.asarray(_moe_dense(layer, cfg, x, w), np.float32)
    # cf = E/k makes C = N: nothing can be dropped
    full = np.asarray(_moe_capacity(layer, cfg, x, w,
                                    cf=cfg.n_experts / cfg.n_experts_used),
                      np.float32)
    np.testing.assert_allclose(full, dense, rtol=2e-2, atol=2e-2)


def test_capacity_drops_overflow(moe_model):
    cfg, params, _ = moe_model
    rng = np.random.default_rng(2)
    N = 64
    x = jnp.asarray(rng.standard_normal((1, N, cfg.dim)), jnp.bfloat16)
    layer = _layer0(params)
    # concentrate ALL routing weight on expert 0 -> capacity C < N drops
    w = jnp.zeros((1, N, cfg.n_experts), jnp.float32).at[..., 0].set(1.0)
    out = np.asarray(_moe_capacity(layer, cfg, x, w, cf=1.0), np.float32)
    dense = np.asarray(_moe_dense(layer, cfg, x, w), np.float32)
    # capacity = N*k*cf/E = 32 of 64 tokens served; the rest dropped to zero
    n_zero = int((np.abs(out).sum(axis=-1) == 0).sum())
    assert n_zero == N - N * cfg.n_experts_used // cfg.n_experts
    # served tokens match dense
    served = np.abs(out).sum(axis=-1) > 0
    np.testing.assert_allclose(out[served], dense[served], rtol=2e-2, atol=2e-2)


def test_moe_forward_runs_all_paths(moe_model, monkeypatch):
    """End-to-end forward with decode-shaped (cond) and prefill-shaped
    (capacity) chunks equals the dense-oracle forward."""
    cfg, params, _ = moe_model
    rng = np.random.default_rng(3)
    for T in (1, 32):
        ids = jnp.asarray(rng.integers(3, 250, size=(2, T)), jnp.int32)
        offsets = jnp.zeros(2, jnp.int32)
        lengths = jnp.full(2, T, jnp.int32)
        cache = KVCache.zeros(cfg, 2, 64)
        sparse, _ = forward(params, cfg, ids, offsets, cache, lengths)
        monkeypatch.setenv("LGT_MOE_DENSE", "1")
        cache = KVCache.zeros(cfg, 2, 64)
        dense, _ = forward(params, cfg, ids, offsets, cache, lengths)
        monkeypatch.delenv("LGT_MOE_DENSE")
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                                   rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2)])
def test_ep_sharded_forward_matches_single_device(moe_model, dp, tp):
    cfg, params, _ = moe_model
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(3, 250, size=(8, 4)), jnp.int32)
    offsets = jnp.zeros(8, jnp.int32)
    lengths = jnp.full(8, 4, jnp.int32)

    cache = KVCache.zeros(cfg, 8, 16)
    ref, _ = forward(params, cfg, ids, offsets, cache, lengths)
    ref = np.asarray(ref)

    mesh = make_mesh(tp=tp, dp=dp)
    sp = shard_params(params, cfg, mesh)
    assert "experts_ep" in sp["layers"][0], "EP stacking should engage"
    assert "experts" not in sp["layers"][0]
    # stacked expert arrays are sharded over tp on the expert axis
    leaf = sp["layers"][0]["experts_ep"]["ffn_gate"].d
    assert leaf.shape[0] == cfg.n_experts
    cache_s = jax.device_put(KVCache.zeros(cfg, 8, 16))
    got, _ = jax.jit(lambda p, i, o, c, ln: forward(p, cfg, i, o, c, ln))(
        sp, ids, offsets, cache_s, lengths)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-2, atol=5e-2)


def test_ep_lite_fallback_when_indivisible(moe_model):
    cfg, params, _ = moe_model
    mesh = make_mesh(tp=8, dp=1)     # 4 experts % 8 != 0 -> EP-lite
    sp = shard_params(params, cfg, mesh)
    assert "experts" in sp["layers"][0]
    assert "experts_ep" not in sp["layers"][0]


def test_stacked_experts_match_per_expert_list(moe_model, tmp_path):
    """Single-chip fused load coalesces experts into stacked (E,)-leading
    arrays (r4: the per-expert array zoo cost minutes of per-array relay
    overhead on Mixtral shapes).  The stacked forward must produce
    BIT-IDENTICAL logits to the per-expert-list forward, and the stacked
    layer must carry ~9 arrays instead of ~E*9."""
    cfg, params_list, reader = moe_model
    path = reader.path if hasattr(reader, "path") else None
    p = tmp_path / "moe2.gguf"
    write_tiny_llama(p, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256, n_experts=4, n_experts_used=2,
                     quant=GGMLType.Q8_0)
    cfg2, params_fused, r2 = load_model(p, mode="quant", fuse=True)
    r2.close()
    assert "experts_st" in params_fused["layers"][0]
    assert "experts" not in params_fused["layers"][0]
    n_leaves = len(jax.tree_util.tree_leaves(
        params_fused["layers"][0]["experts_st"]))
    assert n_leaves <= 12

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(5, 250, size=(1, 6)), jnp.int32)
    cache_a = KVCache.zeros(cfg, 1, 16)
    cache_b = KVCache.zeros(cfg2, 1, 16)
    la, _ = forward(params_list, cfg, ids, jnp.zeros(1, jnp.int32),
                    cache_a, jnp.full(1, 6, jnp.int32))
    lb, _ = forward(params_fused, cfg2, ids, jnp.zeros(1, jnp.int32),
                    cache_b, jnp.full(1, 6, jnp.int32))
    # same weights; fused QKV + stacked experts change only array layout.
    # bf16 matmul association can differ for the fused QKV, so allow tiny
    # numerics; the MoE combine itself is unchanged.
    np.testing.assert_allclose(np.asarray(la, np.float32),
                               np.asarray(lb, np.float32),
                               atol=2e-2, rtol=2e-2)
