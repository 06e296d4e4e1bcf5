"""TP/DP sharding tests on the virtual 8-device CPU mesh (SURVEY §4 extra tier).

Asserts the sharded forward is numerically identical to single-device and
that quant-block integrity rules are enforced.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.parallel.mesh import make_mesh
from llama_gguf_inference_tpu.parallel.partition import (
    batch_sharding, cache_sharding, shard_params,
)
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("m") / "tp.gguf"
    # dim 128 / tp 4 = 32: respects Q8_0 blocks; kv heads 4 shard over tp 4
    write_tiny_llama(p, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256, quant=GGMLType.Q8_0)
    return p


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("dp,tp", [(1, 8), (2, 4), (8, 1)])
def test_sharded_forward_matches_single_device(model_path, dp, tp):
    cfg, params, _ = load_model(model_path, mode="quant")
    ids = np.zeros((8, 4), np.int32)
    rng = np.random.default_rng(1)
    ids[:] = rng.integers(3, 250, size=(8, 4))
    offsets = jnp.zeros(8, jnp.int32)
    lengths = jnp.full(8, 4, jnp.int32)
    cache = KVCache.zeros(cfg, 8, 16)

    ref_logits, _ = forward(params, cfg, jnp.asarray(ids), offsets, cache, lengths)
    ref = np.asarray(ref_logits)

    mesh = make_mesh(tp=tp, dp=dp)
    sp = shard_params(params, cfg, mesh)
    cache_s = jax.device_put(KVCache.zeros(cfg, 8, 16),
                             cache_sharding(mesh, cfg.n_kv_heads, 8))
    ids_s = jax.device_put(jnp.asarray(ids), batch_sharding(mesh, 8))

    step = jax.jit(forward, static_argnums=(1,))
    logits, new_cache = step(sp, cfg, ids_s, offsets, cache_s, lengths)
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
    # cache updated and still sharded
    assert np.asarray(new_cache.k).any()


def test_row_parallel_block_granularity(tmp_path, monkeypatch):
    """K-quant weights shard in-axis at scale-block granularity.

    The compact layout keeps the 256-element super-block hierarchy, so
    in-axis TP splits must align to 256 (production dims — 4096, 14336 —
    are all multiples; a 256/tp2=128 split must replicate instead).  The
    flat layout — the auto default for 4-bit formats — has 32-element
    sub-block granularity.  Numerics under legal splits are pinned by the
    parity test above.
    """
    from jax.sharding import PartitionSpec as P
    p = tmp_path / "q4k.gguf"
    write_tiny_llama(p, dim=256, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=512, quant=GGMLType.Q4_K)
    mesh = make_mesh(tp=2, dp=4)

    # compact: d_size 256 -> dim 256 / tp 2 would split a super-block ->
    # row-parallel weights replicate; ffn_down (in 512) shards fine
    monkeypatch.setenv("LGT_SCALE_LAYOUT", "compact")
    cfg, params, _ = load_model(p, mode="quant")
    assert params["layers"][0]["attn_output"].d_size == 256
    sp = shard_params(params, cfg, mesh)
    ao = sp["layers"][0]["attn_output"]
    assert ao.codes.sharding.spec == P()              # replicated (128 < 256)
    fd = sp["layers"][0]["ffn_down"]                  # in 512 = 2 x 256: legal
    assert fd.codes.sharding.spec == P(None, "tp")
    aq = sp["layers"][0]["attn_q"]                    # column-parallel sharded
    assert aq.codes.sharding.spec == P("tp", None)

    # flat (the auto default for 4-bit): 32-element granularity,
    # 256/2 = 128 is a legal in split
    monkeypatch.setenv("LGT_SCALE_LAYOUT", "auto")
    cfg, params, _ = load_model(p, mode="quant")
    assert params["layers"][0]["attn_output"].d_size == 32   # flattened
    sp = shard_params(params, cfg, mesh)
    ao = sp["layers"][0]["attn_output"]
    assert ao.codes.sharding.spec == P(None, "tp")   # row-parallel sharded

    # a split that would land inside a 32-element sub-block must replicate
    mesh8 = make_mesh(tp=8, dp=1)   # 256/8 = 32 ok for codes but d has 8 subs
    sp8 = shard_params(params, cfg, mesh8)
    assert sp8["layers"][0]["attn_q"].codes.sharding.spec == P("tp", None)


def test_mesh_shapes():
    m = make_mesh(tp=4, dp=2)
    assert m.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(tp=3, dp=3)


def test_engine_on_mesh_matches_single_device(model_path):
    """Full engine (prefill + multi-step decode + sampling) on a (dp,tp) mesh
    produces the same tokens as the single-device engine."""
    from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    p = SamplingParams(temperature=0.0, max_tokens=6)

    def run(tp, dp):
        eng = InferenceEngine(str(model_path), EngineConfig(
            max_slots=2, ctx=64, prefill_buckets=(16,), mode="quant",
            multi_step=2, tp=tp, dp=dp))
        eng.start()
        try:
            return [ev.token_id for ev in eng.generate("hello world", p)]
        finally:
            eng.stop()

    single = run(1, 1)
    sharded = run(4, 2)
    assert sharded == single


def test_paged_engine_on_tp_mesh_matches_single_device(model_path):
    """Paged KV under tensor parallelism: pools shard over KV heads, the
    page table replicates; tokens match the single-device paged engine.
    dp > 1 is rejected (the shared page pool cannot batch-shard)."""
    import pytest
    from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    p = SamplingParams(temperature=0.0, max_tokens=6)

    def run(tp, dp):
        eng = InferenceEngine(str(model_path), EngineConfig(
            max_slots=2, ctx=64, prefill_buckets=(16,), mode="quant",
            multi_step=2, tp=tp, dp=dp, kv_layout="paged", kv_page_size=16))
        eng.start()
        try:
            return [ev.token_id for ev in eng.generate("hello world", p)]
        finally:
            eng.stop()

    single = run(1, 1)
    sharded = run(8, 1)   # dp*tp must cover the 8 virtual devices
    assert sharded == single

    with pytest.raises(ValueError, match="dp"):
        InferenceEngine(str(model_path), EngineConfig(
            max_slots=2, ctx=64, prefill_buckets=(16,), mode="quant",
            tp=4, dp=2, kv_layout="paged"))
