"""GGUF LoRA adapters: parse, apply, numerical parity with merged weights,
engine end-to-end, and TP-sharded forward.

llama-server applies ``--lora`` adapters as ``y = Wx + scale * B(Ax)`` with
``scale = user_scale * alpha / rank`` (reference forwards the flag through
EXTRA_ARGS, ``start.sh:490-494``); this suite pins the same semantics on
the TPU engine (runtime.lora + ops.linear.LoraLinear).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.gguf.writer import GGUFWriter
from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.ops.linear import DenseLinear, LoraLinear
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.runtime.lora import apply_lora, load_adapter
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

RANK, ALPHA = 4, 8.0


def _write_adapter(path, targets, rng, rank=RANK, alpha=ALPHA, mag=0.5):
    """targets: {gguf_base_name: (out, in)}."""
    w = GGUFWriter(path)
    w.add("general.type", "adapter")
    w.add("general.architecture", "llama")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", np.float32(alpha))
    for name, (out, inn) in targets.items():
        a = (rng.standard_normal((rank, inn)) * mag).astype(np.float32)
        b = (rng.standard_normal((out, rank)) * mag).astype(np.float32)
        w.add_tensor(name + ".lora_a", a, GGMLType.F32)
        w.add_tensor(name + ".lora_b", b, GGMLType.F32)
    return w.write()


@pytest.fixture(scope="module")
def base_model(tmp_path_factory):
    p = tmp_path_factory.mktemp("lora") / "base.gguf"
    write_tiny_llama(p, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=256, quant=GGMLType.Q8_0)
    return p


@pytest.fixture(scope="module")
def adapter(tmp_path_factory):
    from llama_gguf_inference_tpu.utils.testing import make_tiny_vocab
    vocab = len(make_tiny_vocab()[0])
    p = tmp_path_factory.mktemp("lora") / "adapter.gguf"
    rng = np.random.default_rng(3)
    # mag 0.1 keeps the adapted net out of the chaotic-attention regime where
    # bf16 rounding differences between the two mathematically-equal paths
    # amplify unboundedly through softmax; the adapter still moves logits ~1.7
    _write_adapter(p, {
        "blk.0.attn_q.weight": (128, 128),
        "blk.1.ffn_down.weight": (128, 256),
        "output.weight": (vocab, 128),
    }, rng, mag=0.1)
    return p


def test_load_adapter_parses(adapter):
    alpha, pairs = load_adapter(str(adapter))
    assert alpha == ALPHA
    assert set(pairs) == {"blk.0.attn_q.weight", "blk.1.ffn_down.weight",
                          "output.weight"}
    a, b = pairs["blk.1.ffn_down.weight"]
    assert a.shape == (RANK, 256) and b.shape == (128, RANK)


def test_rejects_non_adapter(base_model):
    with pytest.raises(ValueError, match="not a GGUF LoRA adapter"):
        load_adapter(str(base_model))


def test_rejects_arch_mismatch(tmp_path):
    p = tmp_path / "qwen_adapter.gguf"
    w = GGUFWriter(p)
    w.add("general.type", "adapter")
    w.add("general.architecture", "qwen2")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", np.float32(8.0))
    w.write()
    with pytest.raises(ValueError, match="architecture"):
        load_adapter(str(p), arch="llama")
    load_adapter(str(p), arch="qwen2")   # matching arch is fine


def test_rejects_shape_mismatch(base_model, tmp_path):
    bad = tmp_path / "bad.gguf"
    _write_adapter(bad, {"blk.0.attn_q.weight": (64, 128)},
                   np.random.default_rng(0))
    _, params, reader = load_model(base_model, mode="dense")
    reader.close()
    with pytest.raises(ValueError, match="shape mismatch"):
        apply_lora(params, str(bad))


def test_unmatched_tensor_skipped(base_model, tmp_path):
    extra = tmp_path / "extra.gguf"
    _write_adapter(extra, {"token_embd.weight": (256, 128),
                           "blk.0.attn_q.weight": (128, 128)},
                   np.random.default_rng(1))
    _, params, reader = load_model(base_model, mode="dense")
    reader.close()
    assert apply_lora(params, str(extra)) == 1   # embd skipped, attn_q ok
    assert isinstance(params["layers"][0]["attn_q"], LoraLinear)


def _merged_params(params, adapter_path, scale):
    """Independent oracle: dense params with B@A merged into each weight."""
    alpha, pairs = load_adapter(str(adapter_path))
    from llama_gguf_inference_tpu.runtime.lora import _resolve
    for name, (a, b) in pairs.items():
        cont, key = _resolve(params, name)
        w = cont[key]
        s = scale * alpha / RANK
        merged = (np.asarray(w.dequantize()).astype(np.float32)
                  + s * (b.astype(np.float32) @ a.astype(np.float32)))
        cont[key] = DenseLinear(w=jnp.asarray(merged, jnp.float32),
                                out_features=w.out_features,
                                in_features=w.in_features)
    return params


def test_matmul_matches_merged_oracle(base_model):
    """Op-level pin of y = Wx + scale*B(Ax): LoraLinear over the quantized
    base must match a dense f32 merged weight to ~bf16-dot noise even with
    large, partially-cancelling deltas (base output must not round to bf16
    before the delta lands)."""
    cfg, params, reader = load_model(base_model, mode="quant")
    reader.close()
    w = params["layers"][0]["attn_q"]
    rng = np.random.default_rng(0)
    a = jnp.asarray((rng.standard_normal((RANK, 128)) * 0.5).astype(np.float32))
    b = jnp.asarray((rng.standard_normal((128, RANK)) * 0.5).astype(np.float32))
    lw = LoraLinear(base=w, a=a, b=b, scale=2.0)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
    got = np.asarray(lw.matmul(x), np.float32)
    merged = (np.asarray(w.dequantize()).astype(np.float32)
              + 2.0 * (np.asarray(b) @ np.asarray(a)))
    dm = DenseLinear(w=jnp.asarray(merged, jnp.float32),
                     out_features=128, in_features=128)
    want = np.asarray(dm.matmul(x), np.float32)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_forward_matches_merged_weights(base_model, adapter, scale):
    cfg, params, reader = load_model(base_model, mode="quant",
                                     lora_path=str(adapter),
                                     lora_scale=scale)
    reader.close()
    assert isinstance(params["layers"][0]["attn_q"], LoraLinear)
    assert params["layers"][0]["attn_q"].scale == scale * ALPHA / RANK

    cfg2, merged, reader2 = load_model(base_model, mode="quant")
    reader2.close()
    merged = _merged_params(merged, adapter, scale)

    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(3, 250, size=(1, 8)).astype(np.int32))
    off = jnp.zeros(1, jnp.int32)
    ln = jnp.full(1, 8, jnp.int32)
    got, _ = forward(params, cfg, ids, off, KVCache.zeros(cfg, 1, 16), ln)
    want, _ = forward(merged, cfg2, ids, off, KVCache.zeros(cfg2, 1, 16), ln)
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)

    # and the adapter actually changes the output vs the plain base
    cfg3, plain, reader3 = load_model(base_model, mode="quant")
    reader3.close()
    base_logits, _ = forward(plain, cfg3, ids, off,
                             KVCache.zeros(cfg3, 1, 16), ln)
    assert np.abs(got - np.asarray(base_logits, np.float32)).max() > 0.1


def test_engine_end_to_end_with_lora(base_model, adapter):
    from llama_gguf_inference_tpu.runtime.engine import (
        EngineConfig, InferenceEngine,
    )
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    def gen(lora_path):
        eng = InferenceEngine(str(base_model), EngineConfig(
            max_slots=1, ctx=64, prefill_buckets=(16,), mode="quant",
            lora_path=lora_path))
        eng.start()
        try:
            return [ev.token_id for ev in
                    eng.generate("hello world", SamplingParams(
                        temperature=0.0, max_tokens=8))]
        finally:
            eng.stop()

    with_lora = gen(str(adapter))
    without = gen("")
    assert len(with_lora) >= 1
    assert with_lora != without   # rank-4 deltas move logits ~1.7 -> greedy tokens


def test_sharded_forward_with_lora(base_model, adapter):
    """LoRA-wrapped params shard onto the (dp, tp) mesh and match the
    single-device forward."""
    from llama_gguf_inference_tpu.parallel.mesh import make_mesh
    from llama_gguf_inference_tpu.parallel.partition import (
        batch_sharding, cache_sharding, shard_params,
    )
    cfg, params, reader = load_model(base_model, mode="quant",
                                     lora_path=str(adapter))
    reader.close()
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 250, size=(8, 4)).astype(np.int32)
    off = jnp.zeros(8, jnp.int32)
    ln = jnp.full(8, 4, jnp.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids), off,
                     KVCache.zeros(cfg, 8, 16), ln)

    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(params, cfg, mesh)
    assert isinstance(sp["layers"][0]["attn_q"], LoraLinear)
    cache_s = jax.device_put(KVCache.zeros(cfg, 8, 16),
                             cache_sharding(mesh, cfg.n_kv_heads, 8))
    ids_s = jax.device_put(jnp.asarray(ids), batch_sharding(mesh, 8))
    step = jax.jit(forward, static_argnums=(1,))
    got, _ = step(sp, cfg, ids_s, off, cache_s, ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
