"""Fused QKV / gate+up projections must be numerically identical."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.ops.linear import fuse_linears
from llama_gguf_inference_tpu.quant import quantize
from llama_gguf_inference_tpu.quant.repack import repack, to_quant_linear
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


def test_fuse_quant_linears_exact(rng):
    ws = []
    mats = []
    for out_f in (64, 32, 32):
        m = rng.normal(size=(out_f, 256)).astype(np.float32)
        mats.append(m)
        ws.append(to_quant_linear(repack(quantize(m, GGMLType.Q4_K),
                                         GGMLType.Q4_K, out_f, 256)))
    fused = fuse_linears(ws)
    assert fused is not None and fused.out_features == 128
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    got = np.asarray(fused.matmul_xla(x))
    want = np.concatenate([np.asarray(w.matmul_xla(x)) for w in ws], axis=-1)
    # rows identical; XLA may tile the wider contraction differently, so
    # allow accumulation-order float noise only
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # dequantized weights themselves must concatenate exactly
    wf = np.asarray(fused.dequantize(np.float32))
    wu = np.concatenate([np.asarray(w.dequantize(np.float32)) for w in ws], axis=0)
    np.testing.assert_array_equal(wf, wu)


def test_fuse_incompatible_returns_none(rng):
    a = to_quant_linear(repack(quantize(rng.normal(size=(32, 256)).astype(np.float32),
                                        GGMLType.Q4_K), GGMLType.Q4_K, 32, 256))
    b = to_quant_linear(repack(quantize(rng.normal(size=(32, 256)).astype(np.float32),
                                        GGMLType.Q8_0), GGMLType.Q8_0, 32, 256))
    assert fuse_linears([a, b]) is None


@pytest.mark.parametrize("quant", [GGMLType.F32, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_fused_forward_matches_unfused(quant, tmp_path):
    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=quant)
    mode = "dense" if quant == GGMLType.F32 else "quant"
    cfg, pu, _ = load_model(p, mode=mode, fuse=False)
    _, pf, _ = load_model(p, mode=mode, fuse=True)
    assert "attn_qkv" in pf["layers"][0]
    assert "ffn_gateup" in pf["layers"][0]

    ids = jnp.asarray(np.array([[1, 263, 270, 275]], np.int32))
    cache = KVCache.zeros(cfg, 1, 8)
    lu, _ = forward(pu, cfg, ids, jnp.zeros(1, jnp.int32), cache,
                    jnp.full(1, 4, jnp.int32))
    lf, _ = forward(pf, cfg, ids, jnp.zeros(1, jnp.int32), cache,
                    jnp.full(1, 4, jnp.int32))
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lu),
                               atol=1e-4, rtol=1e-4)


def test_fuse_preserves_mixed_min_size(rng, monkeypatch):
    """r5 regression: fuse_linears dropped min_size, so mixed-layout
    (LGT_SCALE_LAYOUT=mixed) fused QKV crashed or silently mis-decoded
    whenever in_features > 256 (more than one min super-block)."""
    monkeypatch.setenv("LGT_SCALE_LAYOUT", "mixed")
    in_f = 512
    ws = []
    refs = []
    for out_f in (64, 32, 32):
        x = rng.normal(size=(out_f, in_f)).astype(np.float32)
        ql = to_quant_linear(repack(quantize(x, GGMLType.Q2_K),
                                    GGMLType.Q2_K, out_f, in_f))
        assert ql.min_size == 256, "mixed layout must engage"
        ws.append(ql)
        refs.append(np.asarray(ql.dequantize(jnp.float32)))
    fused = fuse_linears(ws)
    assert fused is not None and fused.min_size == 256
    got = np.asarray(fused.dequantize(jnp.float32))
    np.testing.assert_array_equal(got, np.concatenate(refs, axis=0))
