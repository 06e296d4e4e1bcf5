"""Importance-matrix (IQ) format tests: golden byte-level decode, sign
codebook properties, round-trips, repack exactness, grid-file loading, and
an end-to-end IQ2_XS model (BASELINE config 3; reference backend decodes IQ
formats transparently, SURVEY.md §2.9)."""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType, type_block_info
from llama_gguf_inference_tpu.quant import dequantize, quantize
from llama_gguf_inference_tpu.quant import iq_grids
from llama_gguf_inference_tpu.quant.iq_grids import KSIGNS, get_grid
from llama_gguf_inference_tpu.quant.repack import repack, to_quant_linear

IQ_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
            GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M]


def f16(v):
    return np.float32(np.float16(v))


def f16b(v):
    return np.array([v], dtype="<f2").tobytes()


# ---------------------------------------------------------------------------
# sign codebook (formulaic public ABI)
# ---------------------------------------------------------------------------

def test_ksigns_parity():
    # every entry has an even number of set bits; low 7 bits are the index
    for i, s in enumerate(KSIGNS):
        assert bin(int(s)).count("1") % 2 == 0
        assert int(s) & 127 == i
    assert KSIGNS[0] == 0x00
    assert KSIGNS[1] == 0x81
    assert KSIGNS[3] == 0x03
    assert KSIGNS[127] == 0xFF


# ---------------------------------------------------------------------------
# golden blocks (hand-assembled bytes; expected values computed from the
# decode formula against the active grid table)
# ---------------------------------------------------------------------------

def test_iq2_xxs_golden():
    d = 0.5
    grid = get_grid("iq2xxs").astype(np.float32)
    idx = [3, 200, 0, 77]           # one grid entry per 8-element group
    sidx = [0, 1, 127, 64]          # ksigns indices
    scale4 = 9                      # 4-bit sub-scale
    a0 = sum(idx[l] << (8 * l) for l in range(4))
    a1 = sum(sidx[l] << (7 * l) for l in range(4)) | (scale4 << 28)
    qs = np.zeros(32, dtype="<u2")
    qs[0] = a0 & 0xFFFF
    qs[1] = a0 >> 16
    qs[2] = a1 & 0xFFFF
    qs[3] = a1 >> 16
    # remaining 7 ib32 groups left zero (grid[0], signs 0, scale 0)
    raw = f16b(d) + qs.tobytes()
    out = dequantize(raw, GGMLType.IQ2_XXS, 256)

    db = f16(d) * (0.5 + scale4) * 0.25
    for l in range(4):
        sbyte = int(KSIGNS[sidx[l]])
        for j in range(8):
            sign = -1.0 if (sbyte >> j) & 1 else 1.0
            exp = np.float32(db) * np.float32(
                np.int8(grid[idx[l], j] * sign)) * 1.0
            got = out[8 * l + j]
            assert got == np.float32(np.int8(grid[idx[l], j] * sign)) * np.float32(db), \
                (l, j, got, exp)
    # zero-filled groups decode to grid[0] with scale d*(0.5)*0.25, signs +
    db0 = f16(d) * 0.5 * 0.25
    np.testing.assert_allclose(out[32:64], grid[0][np.arange(32) % 8] * db0,
                               rtol=1e-6)


def test_iq2_xs_golden():
    d = 1.0
    grid = get_grid("iq2xs").astype(np.float32)
    q = np.zeros(32, dtype="<u2")
    q[0] = 511 | (5 << 9)           # group 0: grid entry 511, sign idx 5
    sc = np.zeros(8, np.uint8)
    sc[0] = 0x3A                    # low nibble 10 (first 16), high 3 (second 16)
    raw = f16b(d) + q.tobytes() + sc.tobytes()
    out = dequantize(raw, GGMLType.IQ2_XS, 256)
    db = f16(d) * (0.5 + 10) * 0.25
    sbyte = int(KSIGNS[5])
    for j in range(8):
        sign = -1.0 if (sbyte >> j) & 1 else 1.0
        assert out[j] == np.float32(np.int8(grid[511, j] * sign)) * np.float32(db)
    # groups 2-3 (elements 16..31) use the high-nibble scale
    db2 = f16(d) * (0.5 + 3) * 0.25
    np.testing.assert_allclose(out[16:32], grid[0][np.arange(16) % 8] * db2,
                               rtol=1e-6)


def test_iq1_s_golden():
    d = 2.0
    grid = get_grid("iq1s").astype(np.float32)
    qs = np.zeros(32, np.uint8)
    qh = np.zeros(8, dtype="<u2")
    qs[0] = 0x34                    # group 0 low bits
    qh[0] = (5 << 0) | (3 << 12) | (1 << 15)   # hi bits 5, scale 3, delta neg
    raw = f16b(d) + qs.tobytes() + qh.tobytes()
    out = dequantize(raw, GGMLType.IQ1_S, 256)
    dl = f16(d) * (2 * 3 + 1)
    idx = 0x34 | (5 << 8)
    exp = np.float32(dl) * (grid[idx] + np.float32(-0.125))
    np.testing.assert_allclose(out[:8], exp, rtol=1e-6)


def test_iq1_m_scale_word_packing():
    # d is an f16 distributed over the top nibbles of the 4 scale words;
    # encode then decode a block and confirm the scale path exactly
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(256) * 0.1).astype(np.float32)
    raw = quantize(x, GGMLType.IQ1_M)
    blocks = np.frombuffer(raw, np.uint8).reshape(1, 56)
    sc16 = blocks[:, 48:56].copy().view("<u2").astype(np.uint16)
    du16 = ((sc16[:, 0] >> 12) | ((sc16[:, 1] >> 8) & 0x00F0)
            | ((sc16[:, 2] >> 4) & 0x0F00) | (sc16[:, 3] & 0xF000))
    d = du16.astype("<u2").view("<f2").astype(np.float32)[0]
    assert d > 0 and np.isfinite(d)
    y = dequantize(raw, GGMLType.IQ1_M, 256)
    assert np.isfinite(y).all() and np.abs(y).max() > 0


# ---------------------------------------------------------------------------
# round-trip + repack
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gtype", IQ_TYPES, ids=lambda t: t.name)
def test_iq_roundtrip_and_repack_exact(gtype):
    rng = np.random.default_rng(11)
    O, I = 8, 512
    x = (rng.standard_normal((O, I)) * 0.05).astype(np.float32)
    raw = quantize(x, gtype)
    blk, nbytes = type_block_info(gtype)
    assert len(raw) == O * I // blk * nbytes
    y = dequantize(raw, gtype, O * I).reshape(O, I)
    # lossy low-bit quant: bounded relative error, finite everywhere
    rel = np.abs(y - x).mean() / np.abs(x).mean()
    assert np.isfinite(y).all() and rel < 1.0, rel
    # repack must decode bit-identically (CLAUDE.md invariant)
    ql = to_quant_linear(repack(np.frombuffer(raw, np.uint8), gtype, O, I))
    w = np.asarray(ql.dequantize(dtype=np.float32))
    assert np.array_equal(w, y)


@pytest.mark.parametrize("gtype", IQ_TYPES, ids=lambda t: t.name)
def test_iq_edge_values(gtype):
    blk, _ = type_block_info(gtype)
    for x in (np.zeros(blk, np.float32), np.full(blk, 1.5, np.float32),
              np.full(blk, -0.25, np.float32)):
        y = dequantize(quantize(x, gtype), gtype, blk)
        assert np.isfinite(y).all()
        if x[0] == 0:
            np.testing.assert_allclose(y, 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# grid table loading
# ---------------------------------------------------------------------------

def test_grid_file_loading(tmp_path, monkeypatch):
    # a "real" table: recognizable constant rows
    entries, group, _ = iq_grids.GRID_SPECS["iq2xxs"]
    table = np.tile(np.arange(group, dtype=np.int8)[None], (entries, 1))
    path = tmp_path / "grids.npz"
    np.savez(path, iq2xxs=table)
    monkeypatch.setenv("LGT_IQ_GRID_FILE", str(path))
    monkeypatch.setattr(iq_grids, "_cache", {})
    monkeypatch.setattr(iq_grids, "_loaded_file", None)
    monkeypatch.setattr(iq_grids, "_synthetic", set())
    g = iq_grids.get_grid("iq2xxs")
    assert np.array_equal(g, table)
    assert not iq_grids.grids_are_synthetic()
    # formats absent from the file fall back to synthesis (and say so)
    iq_grids.get_grid("iq2xs")
    assert iq_grids.grids_are_synthetic()


def test_grid_file_bad_shape(tmp_path, monkeypatch):
    np.savez(tmp_path / "g.npz", iq2xxs=np.zeros((4, 8), np.int8))
    monkeypatch.setenv("LGT_IQ_GRID_FILE", str(tmp_path / "g.npz"))
    monkeypatch.setattr(iq_grids, "_cache", {})
    monkeypatch.setattr(iq_grids, "_loaded_file", None)
    with pytest.raises(ValueError):
        iq_grids.get_grid("iq2xxs")


def test_synthesized_grids_deterministic():
    a = iq_grids._synthesize("iq2xs")
    b = iq_grids._synthesize("iq2xs")
    assert np.array_equal(a, b)
    spec = iq_grids.GRID_SPECS["iq2xs"]
    assert a.shape == (spec[0], spec[1])
    assert set(np.unique(a)) <= set(spec[2])
    # entries unique
    assert len({r.tobytes() for r in a}) == spec[0]


# ---------------------------------------------------------------------------
# end-to-end: IQ2_XS model loads and generates (BASELINE config 3 shape-wise)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gtype", [GGMLType.IQ2_XS, GGMLType.IQ1_S],
                         ids=lambda t: t.name)
def test_iq_model_end_to_end(tmp_path, gtype):
    from llama_gguf_inference_tpu.runtime.engine import EngineConfig, InferenceEngine
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams
    from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

    path = write_tiny_llama(tmp_path / f"tiny_{gtype.name.lower()}.gguf",
                            dim=256, ffn_dim=512, quant=gtype)
    eng = InferenceEngine(str(path), EngineConfig(max_slots=1, ctx=128,
                                                  prefill_buckets=(16,),
                                                  mode="quant"))
    eng.start()
    try:
        evs = list(eng.generate([3, 4, 5], SamplingParams(temperature=0.0,
                                                          max_tokens=4)))
        assert evs[-1].finished
        assert evs[-1].finish_reason in ("stop", "length")
        assert all(ev.token_id >= 0 for ev in evs)
    finally:
        eng.stop()
