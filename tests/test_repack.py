"""Repacked TPU layout must decode bit-exactly equal to the wire format."""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.quant import dequantize, quantize
from llama_gguf_inference_tpu.quant.repack import repack, to_quant_linear

FORMATS = [
    GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS,
]


@pytest.mark.parametrize("gtype", FORMATS, ids=lambda t: t.name)
def test_repack_dequant_exact(gtype, rng):
    out_f, in_f = 4, 512
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    raw = quantize(x, gtype)

    golden = dequantize(raw, gtype, out_f * in_f).reshape(out_f, in_f)
    rp = repack(raw, gtype, out_f, in_f)
    ql = to_quant_linear(rp)
    got = np.asarray(ql.dequantize(np.float32))
    np.testing.assert_array_equal(got, golden, err_msg=f"{gtype.name} repack mismatch")


@pytest.mark.parametrize("gtype", [GGMLType.Q8_0, GGMLType.Q4_K], ids=lambda t: t.name)
def test_quant_matmul_xla_matches_dense(gtype, rng):
    out_f, in_f = 8, 256
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    raw = quantize(x, gtype)
    ql = to_quant_linear(repack(raw, gtype, out_f, in_f))
    act = rng.normal(size=(3, in_f)).astype(np.float32)

    w = np.asarray(ql.dequantize(np.float32))
    want = act @ w.T
    got = np.asarray(ql.matmul_xla(act))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gtype", FORMATS, ids=lambda t: t.name)
def test_compact_and_flat_layouts_agree(gtype, rng, monkeypatch):
    """Compact (hierarchical) and flat scale storage decode identically.

    The compact layout (round 2, quant.repack.rw) keeps the wire's
    super-block d x sub-block sc hierarchy at near-wire density; the flat
    layout precomputes f32 effective scales.  Both must produce the same
    f32 dequant — the product d*sc is computed in f32 either way.
    """
    out_f, in_f = 4, 512
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    raw = quantize(x, gtype)

    monkeypatch.setenv("LGT_FLAT_SCALES", "1")
    flat = np.asarray(
        to_quant_linear(repack(raw, gtype, out_f, in_f)).dequantize(np.float32))
    monkeypatch.delenv("LGT_FLAT_SCALES")
    compact = np.asarray(
        to_quant_linear(repack(raw, gtype, out_f, in_f)).dequantize(np.float32))
    np.testing.assert_array_equal(compact, flat,
                                  err_msg=f"{gtype.name} layout mismatch")


def test_loader_embedding_matches_golden(tmp_path):
    """The loader dequantizes a quantized token_embd via repack + XLA (the
    numpy golden codec took 200+ s on 8B tables); values must match the
    golden decode bit-for-bit at f32, and bf16 rounds of it."""
    import jax.numpy as jnp
    import numpy as np
    from llama_gguf_inference_tpu.gguf import GGMLType
    from llama_gguf_inference_tpu.gguf.reader import GGUFReader
    from llama_gguf_inference_tpu.runtime.loader import load_model
    from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

    p = tmp_path / "m.gguf"
    write_tiny_llama(p, dim=256, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=256, quant=GGMLType.Q4_K)
    # write_tiny_llama keeps token_embd f32; rewrite it quantized by
    # quantizing through the tools path instead: simplest is a direct check
    # on a model whose embedding IS quantized -> use the quantize tool
    from llama_gguf_inference_tpu.tools.quantize import quantize_file
    q = tmp_path / "q.gguf"
    quantize_file(str(p), str(q), "Q4_K_M")

    reader = GGUFReader(q)
    assert reader.tensors["token_embd.weight"].ggml_type != GGMLType.F32
    golden = reader.tensor_f32("token_embd.weight")
    reader.close()

    cfg, params, r2 = load_model(q, mode="quant")
    r2.close()
    # r4: the table stays quantized-resident; its full dequant (and a
    # row gather through the serving path) must still match the golden
    # decode bit-for-bit at f32
    from llama_gguf_inference_tpu.ops.linear import QuantEmbedding, embed_lookup
    emb = params["tok_embd"]
    assert isinstance(emb, QuantEmbedding)
    got = np.asarray(emb.dequantize(jnp.float32))
    np.testing.assert_array_equal(got, golden)
    ids = jnp.asarray([[0, 5, 17], [250, 3, 9]], jnp.int32)
    rows = np.asarray(embed_lookup(emb, ids).astype(jnp.float32))
    want_rows = np.asarray(jnp.asarray(
        golden, jnp.bfloat16).astype(jnp.float32))[np.asarray(ids)]
    np.testing.assert_array_equal(rows, want_rows)
