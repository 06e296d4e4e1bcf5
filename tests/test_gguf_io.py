"""GGUF writer -> reader round-trip tests (format layer, SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf import GGMLType, GGUFReader, GGUFWriter, GGUFValueType


@pytest.fixture
def tmp_gguf(tmp_path):
    return tmp_path / "model.gguf"


def test_metadata_roundtrip(tmp_gguf):
    w = GGUFWriter(tmp_gguf)
    w.add("general.architecture", "llama")
    w.add("general.name", "unit-test")
    w.add("llama.block_count", 2)
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("tokenizer.ggml.add_bos_token", True)
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "▁world"])
    w.add("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.5, 3.25], dtype=np.float32))
    w.add("tokenizer.ggml.token_type", np.array([3, 3, 1, 1], dtype=np.int32))
    w.add("big", 2**40)
    w.add("neg", -7)
    w.write()

    r = GGUFReader(tmp_gguf)
    md = r.metadata
    assert md["general.architecture"] == "llama"
    assert md["llama.block_count"] == 2
    assert md["tokenizer.ggml.add_bos_token"] is True
    assert abs(md["llama.attention.layer_norm_rms_epsilon"] - 1e-5) < 1e-12
    assert md["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello", "▁world"]
    np.testing.assert_allclose(md["tokenizer.ggml.scores"], [0.0, -1.0, -2.5, 3.25])
    assert md["tokenizer.ggml.token_type"].dtype == np.int32
    assert md["big"] == 2**40
    assert md["neg"] == -7
    r.close()


def test_tensor_roundtrip_f32_and_quant(tmp_gguf, rng):
    w = GGUFWriter(tmp_gguf)
    w.add("general.architecture", "llama")
    a = rng.normal(size=(8, 64)).astype(np.float32)
    b = rng.normal(size=(4, 256)).astype(np.float32)
    w.add_tensor("a.weight", a, GGMLType.F32)
    w.add_tensor("b.weight", b, GGMLType.Q8_0)
    w.add_tensor("c.weight", b, GGMLType.Q4_K)
    w.write()

    r = GGUFReader(tmp_gguf)
    assert set(r.tensors) == {"a.weight", "b.weight", "c.weight"}
    ia = r.tensors["a.weight"]
    assert ia.shape == (8, 64)
    assert ia.ggml_shape == (64, 8)   # ne[0] fastest-varying
    np.testing.assert_allclose(r.tensor_f32("a.weight"), a)
    yb = r.tensor_f32("b.weight")
    assert yb.shape == (4, 256)
    assert np.abs(yb - b).max() < 0.01 * np.abs(b).max()
    yc = r.tensor_f32("c.weight")
    assert np.abs(yc - b).max() < 0.1 * np.abs(b).max()
    r.close()


def test_alignment_and_offsets(tmp_gguf):
    w = GGUFWriter(tmp_gguf, alignment=64)
    w.add("general.alignment", 64)
    w.add_tensor("t0", np.ones((1, 32), np.float32), GGMLType.F32)  # 128 bytes
    w.add_tensor("t1", np.ones((1, 32), np.float32), GGMLType.Q8_0)  # 34 bytes
    w.add_tensor("t2", np.ones((1, 32), np.float32), GGMLType.F32)
    w.write()
    r = GGUFReader(tmp_gguf)
    assert r.alignment == 64
    offs = [r.tensors[n].offset for n in ("t0", "t1", "t2")]
    assert all(o % 64 == 0 for o in offs)
    assert offs[1] - offs[0] == 128
    assert offs[2] - offs[1] == 64   # 34 rounded up
    np.testing.assert_allclose(r.tensor_f32("t2"), 1.0)
    r.close()


def test_bad_magic(tmp_path):
    p = tmp_path / "junk.gguf"
    p.write_bytes(b"NOTGGUF!" * 4)
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(p)


# ---- hostile-input robustness (SECURITY_AUDIT.md N-02): malformed files
# must fail with a typed error, never read out of bounds or hang ----------

def _valid_file(path):
    w = GGUFWriter(path)
    w.add("general.name", "victim")
    w.add_tensor("t", np.ones((2, 32), np.float32), GGMLType.F32)
    w.write()
    return path.read_bytes()


def test_truncated_file(tmp_path):
    raw = _valid_file(tmp_path / "ok.gguf")
    for cut in (6, 20, len(raw) // 2):
        p = tmp_path / f"cut{cut}.gguf"
        p.write_bytes(raw[:cut])
        with pytest.raises((EOFError, ValueError)):
            r = GGUFReader(p)
            r.tensor_bytes("t")


def test_oversized_string_length(tmp_path):
    raw = bytearray(_valid_file(tmp_path / "ok.gguf"))
    # first metadata key starts right after magic/version/counts (4+4+8+8);
    # its u64 length field is attacker-controlled — claim 2**60 bytes
    raw[24:32] = (1 << 60).to_bytes(8, "little")
    p = tmp_path / "bigstr.gguf"
    p.write_bytes(raw)
    with pytest.raises(ValueError, match="exceeds file size"):
        GGUFReader(p)


def test_tensor_extent_past_eof(tmp_path):
    p = tmp_path / "ext.gguf"
    w = GGUFWriter(p)
    w.add_tensor("t", np.ones((2, 32), np.float32), GGMLType.F32)
    w.write()
    # chop tensor data so the declared extent overruns the mmap
    raw = p.read_bytes()
    p.write_bytes(raw[:-64])
    with pytest.raises(ValueError, match="past end of file"):
        GGUFReader(p)


def test_bad_version(tmp_path):
    import struct as _s
    p = tmp_path / "v9.gguf"
    p.write_bytes(_s.pack("<IIQQ", 0x46554747, 9, 0, 0))
    with pytest.raises(ValueError, match="version"):
        GGUFReader(p)


def test_bad_alignment(tmp_gguf):
    w = GGUFWriter(tmp_gguf)
    w.add("general.alignment", 0)
    w.write()
    with pytest.raises(ValueError, match="alignment"):
        GGUFReader(tmp_gguf)


def test_huge_metadata_array_count(tmp_path):
    raw = bytearray(_valid_file(tmp_path / "ok.gguf"))
    # rewrite first KV into an ARRAY claiming 2**59 f32 items:
    # key len(12)+"general.name", vtype -> ARRAY(9), item_type F32(6), count
    off = 24 + 8 + 12          # past key string
    raw[off:off + 4] = (9).to_bytes(4, "little")
    payload = (6).to_bytes(4, "little") + (1 << 59).to_bytes(8, "little")
    raw[off + 4:off + 4 + len(payload)] = payload
    p = tmp_path / "bigarr.gguf"
    p.write_bytes(raw)
    with pytest.raises((ValueError, EOFError)):
        GGUFReader(p)
