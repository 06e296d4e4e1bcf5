"""MIXED scale layout (quant.repack.mixed_repacked): flat effective scale +
hierarchical min side at ~4.4 bpw for q2_k — exact, and kernel-consistent
with the XLA path (BASELINE config-3 round two, VERDICT r4 #2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.quant.numpy_ref import dequantize, quantize
from llama_gguf_inference_tpu.quant.repack import (
    mixed_repacked, repack, to_quant_linear,
)

FMTS = [GGMLType.Q2_K, GGMLType.Q4_K]


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _repacked(rng, gtype, out_f=8, in_f=1024):
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    raw = quantize(x, gtype)
    return raw, repack(raw, gtype, out_f, in_f)


@pytest.mark.parametrize("gtype", FMTS, ids=lambda t: t.name)
def test_mixed_dequant_bit_identical_to_golden(rng, gtype):
    out_f, in_f = 8, 1024
    raw, rp = _repacked(rng, gtype, out_f, in_f)
    golden = dequantize(raw, gtype, out_f * in_f).reshape(out_f, in_f)
    ql = to_quant_linear(mixed_repacked(rp))
    assert ql.min_size == 256 and ql.d_size == ql.sub_size and ql.sc is None
    got = np.asarray(ql.dequantize(np.float32))
    np.testing.assert_array_equal(got, golden,
                                  err_msg=f"{gtype.name} mixed decode drift")


@pytest.mark.parametrize("gtype", FMTS, ids=lambda t: t.name)
def test_mixed_kernel_matches_xla(rng, gtype):
    # interpret-mode Pallas (qsplit/fsplit with the permuted xsum dot)
    # against the pure-XLA mixed path on the same weight (same
    # scale-normalized bound as tests/test_pallas_matmul.py — the kernel's
    # exact-f32 min dot vs XLA's bf16-rounded w differ at bf16 noise)
    out_f, in_f = 256, 2048
    _, rp = _repacked(rng, gtype, out_f, in_f)
    ql = to_quant_linear(mixed_repacked(rp))
    x = jnp.asarray(rng.normal(size=(4, in_f)).astype(np.float32),
                    jnp.bfloat16)
    from llama_gguf_inference_tpu.ops.pallas_matmul import pallas_quant_matmul
    ref = np.asarray(ql.matmul_xla(x, jnp.float32))
    got = np.asarray(pallas_quant_matmul(ql, x, jnp.float32))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-2


@pytest.mark.parametrize("gtype", FMTS, ids=lambda t: t.name)
def test_mixed_kernel_matches_flat_kernel(rng, gtype):
    # permutation pin: the mixed kernel's (s, σ)-ordered min dot must equal
    # the flat kernel's σ'-ordered one to f32-reassociation noise — a wrong
    # xsum/mn permutation shows up as O(1) errors, not 1e-4
    from llama_gguf_inference_tpu.ops.pallas_matmul import pallas_quant_matmul
    from llama_gguf_inference_tpu.quant.repack import flatten_repacked
    out_f, in_f = 256, 2048
    _, rp = _repacked(rng, gtype, out_f, in_f)
    x = jnp.asarray(rng.normal(size=(4, in_f)).astype(np.float32),
                    jnp.bfloat16)
    got_m = np.asarray(pallas_quant_matmul(
        to_quant_linear(mixed_repacked(rp)), x, jnp.float32))
    got_f = np.asarray(pallas_quant_matmul(
        to_quant_linear(flatten_repacked(rp)), x, jnp.float32))
    scale = np.abs(got_f).max() + 1e-6
    assert np.abs(got_m - got_f).max() / scale < 1e-3


def test_mixed_density_q2k(rng):
    # stored bpw: codes 2 + flat f32 scale per 16 (2) + dmin f32/256
    # (0.125) + mn u8/16 (0.5) = 4.625 -> 4.375 once mn packs to u4?  No:
    # current mn stays u8 -> assert the real arithmetic so the number in
    # docs can't drift from the code
    out_f, in_f = 8, 2048
    _, rp = _repacked(rng, GGMLType.Q2_K, out_f, in_f)
    mx = mixed_repacked(rp)
    total_bits = 8 * (mx.codes.nbytes + mx.d.nbytes + mx.dmin.nbytes
                      + mx.mn.nbytes)
    bpw = total_bits / (out_f * in_f)
    assert bpw == pytest.approx(4.625, abs=0.01)
    # vs flat 6.0 and int8-widened 8+: the capacity win the layout exists for
    from llama_gguf_inference_tpu.quant.repack import flatten_repacked
    fl = flatten_repacked(rp)
    flat_bpw = 8 * (fl.codes.nbytes + fl.d.nbytes + fl.dmin.nbytes) / (out_f * in_f)
    assert flat_bpw == pytest.approx(6.0, abs=0.01)


def test_mixed_env_policy(rng, monkeypatch):
    monkeypatch.setenv("LGT_SCALE_LAYOUT", "mixed")
    _, rp = _repacked(rng, GGMLType.Q2_K)
    ql = to_quant_linear(rp)
    assert ql.min_size == 256
    # bias-carrying formats degrade to flat (no cross-order bias fold)
    x = np.asarray(np.random.default_rng(0).normal(size=(8, 1024)),
                   np.float32)
    raw = quantize(x, GGMLType.Q3_K)     # code_bias 4
    ql3 = to_quant_linear(repack(raw, GGMLType.Q3_K, 8, 1024))
    assert ql3.min_size == 0 and ql3.d_size == ql3.sub_size
