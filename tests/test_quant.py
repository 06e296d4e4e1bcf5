"""Golden + round-trip tests for the numpy quant codecs.

Tier the reference lacks (SURVEY.md §4 "Implication"): numerical tests pinning
the GGML block wire format.  Golden blocks are constructed byte-by-byte from
the public format spec and decoded values derived by hand — they test the
decoder independently of our encoders.
"""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType, type_block_info
from llama_gguf_inference_tpu.quant import dequantize, quantize
from llama_gguf_inference_tpu.quant.numpy_ref import KVALUES_IQ4NL


def f16b(v):
    return np.array([v], dtype="<f2").tobytes()


# ---------------------------------------------------------------------------
# hand-computed golden blocks (decoder correctness, byte-level)
# ---------------------------------------------------------------------------

def test_q8_0_golden():
    d = 0.5
    qs = np.arange(-16, 16, dtype=np.int8)
    raw = f16b(d) + qs.tobytes()
    out = dequantize(raw, GGMLType.Q8_0, 32)
    np.testing.assert_allclose(out, qs.astype(np.float32) * np.float32(np.float16(d)))


def test_q4_0_golden():
    # nibble j low = element j, high = element j+16; value = (q - 8) * d
    d = 0.25
    q = np.arange(32, dtype=np.uint8) % 16
    packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
    raw = f16b(d) + packed.tobytes()
    out = dequantize(raw, GGMLType.Q4_0, 32)
    np.testing.assert_allclose(out, (q.astype(np.float32) - 8) * 0.25)


def test_q4_1_golden():
    d, m = 0.5, -1.0
    q = (np.arange(32, dtype=np.uint8) * 7) % 16
    packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
    raw = f16b(d) + f16b(m) + packed.tobytes()
    out = dequantize(raw, GGMLType.Q4_1, 32)
    np.testing.assert_allclose(out, q.astype(np.float32) * 0.5 - 1.0)


def test_q5_0_golden():
    # element j: q = low_nibble | (qh bit j << 4); value = (q - 16) * d
    d = 1.0
    q = np.arange(32, dtype=np.uint8)          # exactly 0..31, uses all 5 bits
    lo = q & 0x0F
    hb = (q >> 4) & 1
    qh = np.uint32(0)
    for j in range(32):
        qh |= np.uint32(int(hb[j]) << j)
    packed = (lo[:16] | (lo[16:] << 4)).astype(np.uint8)
    raw = f16b(d) + int(qh).to_bytes(4, "little") + packed.tobytes()
    out = dequantize(raw, GGMLType.Q5_0, 32)
    np.testing.assert_allclose(out, q.astype(np.float32) - 16.0)


def test_q5_1_golden():
    d, m = 0.5, 2.0
    q = (np.arange(32, dtype=np.uint8) * 11) % 32
    lo = q & 0x0F
    hb = (q >> 4) & 1
    qh = 0
    for j in range(32):
        qh |= int(hb[j]) << j
    packed = (lo[:16] | (lo[16:] << 4)).astype(np.uint8)
    raw = f16b(d) + f16b(m) + qh.to_bytes(4, "little") + packed.tobytes()
    out = dequantize(raw, GGMLType.Q5_1, 32)
    np.testing.assert_allclose(out, q.astype(np.float32) * 0.5 + 2.0)


def test_q4_k_golden():
    # one super-block: d=1, dmin=0.5; sub-block scales sc[j]=j+1, mins mn[j]=j
    d, dmin = 1.0, 0.5
    sc = np.arange(1, 9, dtype=np.uint8)    # 6-bit values
    mn = np.arange(0, 8, dtype=np.uint8)
    scales = np.zeros(12, dtype=np.uint8)
    for j in range(4):
        scales[j] = sc[j] & 63
        scales[j + 4] = mn[j] & 63
    for j in range(4, 8):
        scales[j + 4] = (sc[j] & 0x0F) | ((mn[j] & 0x0F) << 4)
        scales[j - 4] |= (sc[j] >> 4) << 6
        scales[j] |= (mn[j] >> 4) << 6
    # qs: chunk c (32 bytes) -> elements 64c..64c+31 in low nibbles, +32..+63 high
    q = np.arange(256, dtype=np.uint8) % 16
    qs = np.zeros(128, dtype=np.uint8)
    for c in range(4):
        qs[32 * c:32 * (c + 1)] = q[64 * c:64 * c + 32] | (q[64 * c + 32:64 * c + 64] << 4)
    raw = f16b(d) + f16b(dmin) + scales.tobytes() + qs.tobytes()
    out = dequantize(raw, GGMLType.Q4_K, 256)
    expect = np.empty(256, dtype=np.float32)
    for j in range(8):
        seg = q[32 * j:32 * (j + 1)].astype(np.float32)
        expect[32 * j:32 * (j + 1)] = 1.0 * sc[j] * seg - 0.5 * mn[j]
    np.testing.assert_allclose(out, expect)


def test_q6_k_golden():
    # d=0.5, all 16 scales = 2, q pattern exercising ql/qh packing
    d = 0.5
    sc = np.full(16, 2, dtype=np.int8)
    q = (np.arange(256) * 7 % 64).astype(np.uint8)   # 6-bit values
    ql = np.zeros(128, dtype=np.uint8)
    qh = np.zeros(64, dtype=np.uint8)
    for half in range(2):
        base = 128 * half
        q1, q2 = q[base:base + 32], q[base + 32:base + 64]
        q3, q4 = q[base + 64:base + 96], q[base + 96:base + 128]
        ql[64 * half:64 * half + 32] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
        ql[64 * half + 32:64 * half + 64] = (q2 & 0x0F) | ((q4 & 0x0F) << 4)
        qh[32 * half:32 * (half + 1)] = ((q1 >> 4) | ((q2 >> 4) << 2)
                                         | ((q3 >> 4) << 4) | ((q4 >> 4) << 6))
    raw = ql.tobytes() + qh.tobytes() + sc.tobytes() + f16b(d)
    out = dequantize(raw, GGMLType.Q6_K, 256)
    expect = 0.5 * 2.0 * (q.astype(np.float32) - 32.0)
    np.testing.assert_allclose(out, expect)


def test_q2_k_golden():
    # scales[i]: low4 = scale, high4 = min; elements 0..127 from qs[0..31]
    d, dmin = 1.0, 1.0
    scales = np.array([(i % 4) | ((i % 3) << 4) for i in range(16)], dtype=np.uint8)
    q = (np.arange(256) % 4).astype(np.uint8)
    qs = np.zeros(64, dtype=np.uint8)
    for half in range(2):
        for j in range(4):
            qs[32 * half:32 * (half + 1)] |= q[128 * half + 32 * j:128 * half + 32 * (j + 1)] << (2 * j)
    raw = scales.tobytes() + qs.tobytes() + f16b(d) + f16b(dmin)
    out = dequantize(raw, GGMLType.Q2_K, 256)
    expect = np.empty(256, np.float32)
    for i in range(16):
        seg = q[16 * i:16 * (i + 1)].astype(np.float32)
        expect[16 * i:16 * (i + 1)] = (i % 4) * seg - (i % 3)
    np.testing.assert_allclose(out, expect)


def test_q3_k_golden():
    # 16 six-bit scales (bias 32); hmask bit set -> no -4 offset
    d = 2.0
    ls = np.arange(-8, 8, dtype=np.int32)            # signed scales
    s6 = (ls + 32).astype(np.uint8)
    sc12 = np.zeros(12, dtype=np.uint8)
    for j in range(16):
        sc12[j % 8] |= (s6[j] & 0x0F) << (4 * (j // 8))
        sc12[8 + j % 4] |= (s6[j] >> 4) << (2 * (j // 4))
    qsigned = (np.arange(256) % 8).astype(np.int32) - 4   # in [-4, 3]
    qb = qsigned + 4                                      # biased [0,7]
    qs = np.zeros(64, dtype=np.uint8)
    hmask = np.zeros(32, dtype=np.uint8)
    m = 1
    for half in range(2):
        for j in range(4):
            grp = qb[128 * half + 32 * j:128 * half + 32 * (j + 1)]
            qs[32 * half:32 * (half + 1)] |= ((grp & 3) << (2 * j)).astype(np.uint8)
            hmask |= np.where(grp >= 4, m, 0).astype(np.uint8)
            m <<= 1
    raw = hmask.tobytes() + qs.tobytes() + sc12.tobytes() + f16b(d)
    out = dequantize(raw, GGMLType.Q3_K, 256)
    expect = np.empty(256, np.float32)
    for i in range(16):
        expect[16 * i:16 * (i + 1)] = d * ls[i] * qsigned[16 * i:16 * (i + 1)]
    np.testing.assert_allclose(out, expect)


def test_q5_k_golden():
    d, dmin = 1.0, 0.0
    sc = np.full(8, 3, dtype=np.uint8)
    mn = np.zeros(8, dtype=np.uint8)
    scales = np.zeros(12, dtype=np.uint8)
    for j in range(4):
        scales[j] = sc[j]
        scales[j + 4] = mn[j]
    for j in range(4, 8):
        scales[j + 4] = (sc[j] & 0x0F) | ((mn[j] & 0x0F) << 4)
        scales[j - 4] |= (sc[j] >> 4) << 6
        scales[j] |= (mn[j] >> 4) << 6
    q = (np.arange(256) % 32).astype(np.uint8)      # 5-bit values
    qs = np.zeros(128, dtype=np.uint8)
    qh = np.zeros(32, dtype=np.uint8)
    for c in range(4):
        q1 = q[64 * c:64 * c + 32]
        q2 = q[64 * c + 32:64 * c + 64]
        qs[32 * c:32 * (c + 1)] = (q1 & 0x0F) | ((q2 & 0x0F) << 4)
        qh |= ((q1 >> 4) << (2 * c)) | ((q2 >> 4) << (2 * c + 1))
    raw = f16b(d) + f16b(dmin) + scales.tobytes() + qh.tobytes() + qs.tobytes()
    out = dequantize(raw, GGMLType.Q5_K, 256)
    np.testing.assert_allclose(out, 3.0 * q.astype(np.float32))


def test_iq4_nl_golden():
    d = 0.5
    idx = (np.arange(32) % 16).astype(np.uint8)
    packed = idx[:16] | (idx[16:] << 4)
    raw = f16b(d) + packed.tobytes()
    out = dequantize(raw, GGMLType.IQ4_NL, 32)
    np.testing.assert_allclose(out, KVALUES_IQ4NL[idx] * 0.5)


def test_f16_bf16_f32():
    x = np.array([0.5, -1.25, 3.0, -0.0], dtype=np.float32)
    np.testing.assert_allclose(dequantize(x.tobytes(), GGMLType.F32, 4), x)
    np.testing.assert_allclose(dequantize(x.astype("<f2").tobytes(), GGMLType.F16, 4), x)
    bf = (x.view(np.uint32) >> 16).astype("<u2")
    np.testing.assert_allclose(dequantize(bf.tobytes(), GGMLType.BF16, 4), x)


# ---------------------------------------------------------------------------
# encoder→decoder round trips (tolerance scaled by format bit-width)
# ---------------------------------------------------------------------------

ROUNDTRIP_CASES = [
    (GGMLType.Q8_0, 0.01),
    (GGMLType.Q4_0, 0.10),
    (GGMLType.Q4_1, 0.08),
    (GGMLType.Q5_0, 0.05),
    (GGMLType.Q5_1, 0.04),
    (GGMLType.Q2_K, 0.40),
    (GGMLType.Q3_K, 0.25),
    (GGMLType.Q4_K, 0.10),
    (GGMLType.Q5_K, 0.05),
    (GGMLType.Q6_K, 0.03),
    (GGMLType.Q8_K, 0.01),
    (GGMLType.IQ4_NL, 0.15),
    (GGMLType.IQ4_XS, 0.15),
]


@pytest.mark.parametrize("gtype,rtol", ROUNDTRIP_CASES, ids=lambda c: getattr(c, "name", c))
def test_roundtrip(gtype, rtol, rng):
    blk, nbytes = type_block_info(gtype)
    n = blk * 7
    x = rng.normal(size=n).astype(np.float32)
    raw = quantize(x, gtype)
    assert len(raw) == 7 * nbytes
    y = dequantize(raw, gtype, n)
    scale = np.abs(x).max()
    err = np.abs(y - x).max()
    assert err <= rtol * scale, f"{gtype.name}: max err {err:.4f} vs tol {rtol * scale:.4f}"


@pytest.mark.parametrize("gtype", [t for t, _ in ROUNDTRIP_CASES],
                         ids=lambda c: getattr(c, "name", c))
def test_roundtrip_edge_values(gtype, rng):
    """Zero blocks and constant blocks must encode/decode without NaN."""
    blk, _ = type_block_info(gtype)
    for x in (np.zeros(blk, np.float32), np.full(blk, 2.5, np.float32),
              np.full(blk, -1.0, np.float32)):
        y = dequantize(quantize(x, gtype), gtype, blk)
        assert np.isfinite(y).all()
        if x[0] == 0:
            np.testing.assert_allclose(y, 0.0, atol=1e-6)
