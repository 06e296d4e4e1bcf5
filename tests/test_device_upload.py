"""Bulk blob upload must be bit-identical to per-tensor transfers.

runtime.device_upload ships the layout cache's data.bin in coalesced
chunks and carves tensors on device (slice -> bitcast -> reshape, plus the
compact->flat scale relayout for 4-bit formats).  Every resulting
QuantLinear array must equal the per-tensor path
``to_quant_linear(cache.get(name))`` byte for byte — this is the warm-boot
hot path, so any divergence silently corrupts weights.
"""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.quant import quantize
from llama_gguf_inference_tpu.quant.repack import repack, to_quant_linear
from llama_gguf_inference_tpu.runtime.device_upload import bulk_upload
from llama_gguf_inference_tpu.runtime.layout_cache import LayoutCache
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

FORMATS = [
    GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q2_K,
    GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ4_XS,
]


def _make_cache(tmp_path, monkeypatch, tensors):
    monkeypatch.setenv("LGT_LAYOUT_CACHE_DIR", str(tmp_path / "lc"))
    model = tmp_path / "m.gguf"
    write_tiny_llama(model, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    cache = LayoutCache.open(model)
    assert cache is not None
    for name, rp in tensors:
        cache.put(name, rp)
    cache.finalize()
    return LayoutCache.open(model)   # fresh open, reads the manifest


def _assert_ql_equal(a, b, name):
    for f in ("fmt", "bits", "sub_size", "d_size", "code_bias",
              "out_features", "in_features"):
        assert getattr(a, f) == getattr(b, f), (name, f)
    for f in ("codes", "d", "sc", "dmin", "mn"):
        x, y = getattr(a, f), getattr(b, f)
        assert (x is None) == (y is None), (name, f)
        if x is not None:
            assert np.asarray(x).dtype == np.asarray(y).dtype, (name, f)
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{name}.{f}")


@pytest.mark.parametrize("gtype", FORMATS, ids=lambda t: t.name)
def test_bulk_upload_matches_per_tensor(gtype, rng, tmp_path, monkeypatch):
    out_f, in_f = 8, 512
    tensors = []
    for i in range(3):
        x = rng.normal(size=(out_f, in_f)).astype(np.float32)
        tensors.append((f"t{i}", repack(quantize(x, gtype), gtype,
                                        out_f, in_f)))
    cache = _make_cache(tmp_path, monkeypatch, tensors)
    got = bulk_upload(cache, [n for n, _ in tensors])
    for name, _ in tensors:
        want = to_quant_linear(cache.get(name))
        _assert_ql_equal(got[name], want, name)


def test_bulk_upload_chunks_and_mixed_formats(rng, tmp_path, monkeypatch):
    """Multiple chunks (1 MB limit), mixed formats + shapes in one blob."""
    monkeypatch.setenv("LGT_UPLOAD_CHUNK_MB", "1")
    specs = [("a", GGMLType.Q4_K, 64, 1024), ("b", GGMLType.Q6_K, 32, 512),
             ("c", GGMLType.Q8_0, 128, 2048), ("d", GGMLType.Q4_K, 256, 512),
             ("e", GGMLType.Q2_K, 16, 256)]
    tensors = []
    for name, gt, o, i in specs:
        x = rng.normal(size=(o, i)).astype(np.float32)
        tensors.append((name, repack(quantize(x, gt), gt, o, i)))
    cache = _make_cache(tmp_path, monkeypatch, tensors)
    got = bulk_upload(cache, [n for n, _ in tensors])
    for name, _ in tensors:
        _assert_ql_equal(got[name], to_quant_linear(cache.get(name)), name)


def test_bulk_upload_missing_tensor_raises(rng, tmp_path, monkeypatch):
    x = rng.normal(size=(8, 512)).astype(np.float32)
    cache = _make_cache(tmp_path, monkeypatch,
                        [("t0", repack(quantize(x, GGMLType.Q4_K),
                                       GGMLType.Q4_K, 8, 512))])
    with pytest.raises(KeyError):
        bulk_upload(cache, ["t0", "nope"])


def test_unfinalized_blob_is_readable(rng, tmp_path, monkeypatch):
    """Cold boot resolves pendings BEFORE finalize renames the tmp blob."""
    monkeypatch.setenv("LGT_LAYOUT_CACHE_DIR", str(tmp_path / "lc"))
    model = tmp_path / "m.gguf"
    write_tiny_llama(model, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=96)
    cache = LayoutCache.open(model)
    x = rng.normal(size=(8, 512)).astype(np.float32)
    rp = repack(quantize(x, GGMLType.Q4_K), GGMLType.Q4_K, 8, 512)
    cache.put("t0", rp)
    got = bulk_upload(cache, ["t0"])       # tmp blob, pre-rename
    _assert_ql_equal(got["t0"], to_quant_linear(rp), "t0")
    cache.finalize()
    got2 = bulk_upload(cache, ["t0"])      # published blob
    _assert_ql_equal(got2["t0"], to_quant_linear(cache.get("t0")), "t0")
