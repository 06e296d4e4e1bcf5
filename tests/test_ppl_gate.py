"""Delta-perplexity regression gate (SURVEY §7 step 10 / VERDICT r1 item 10).

CI fails when a kernel/repack change moves perplexity:

- quant-vs-f16 on identical weights: relative dppl must stay small (random
  tiny weights -> quant error contributes ~0.1% relative; a broken decode
  rule blows it up by orders of magnitude)
- quant-kernel-vs-dense-dequant on the SAME Q4_K file: both paths decode
  identical weights, so any gap is pure kernel/repack numerics (bf16
  matmul association differences only)
"""

import math

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.tools.perplexity import model_logprob_sum
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

pytestmark = pytest.mark.slow

TOKENS = list(np.random.default_rng(0).integers(3, 250, size=160))
CTX = 64


def _ppl(path, mode="quant"):
    total, n = model_logprob_sum(str(path), TOKENS, ctx=CTX, mode=mode)
    return math.exp(-total / n)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("pplgate")
    paths = {}
    for q in (GGMLType.F16, GGMLType.Q4_K):
        p = d / f"m_{q.name}.gguf"
        write_tiny_llama(p, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
                         ffn_dim=512, quant=q, seed=7)
        paths[q.name] = p
    return paths


def test_dppl_quant_vs_f16_gate(models):
    ppl_f16 = _ppl(models["F16"])
    ppl_q4k = _ppl(models["Q4_K"])
    rel = abs(ppl_q4k - ppl_f16) / ppl_f16
    # measured baseline 0.007 relative on this seed/corpus; gate at ~3x
    # headroom.  a decode-rule regression (wrong scales, bad unpack) lands
    # orders of magnitude higher (>0.1).
    assert rel < 0.02, f"dppl gate: q4k {ppl_q4k:.3f} vs f16 {ppl_f16:.3f}"


def test_dppl_kernel_vs_dense_path_gate(models):
    ppl_quant = _ppl(models["Q4_K"], mode="quant")
    ppl_dense = _ppl(models["Q4_K"], mode="dense")
    rel = abs(ppl_quant - ppl_dense) / ppl_dense
    # same weights, two decode paths: gap is kernel numerics only
    assert rel < 0.002, (ppl_quant, ppl_dense)


# -- low-bit formats (r4; VERDICT r3 #9) -------------------------------------
#
# How these self-referential gates map to the BASELINE "dppl <= 0.01 vs
# llama.cpp at identical bit width" target (no llama.cpp binary exists in
# this environment — tests/test_hf_parity.py:7):
#
#   ppl_ours(q) - ppl_llamacpp(q)
#     = [decode-rule differences] + [matmul-numerics differences]
#
# The FIRST term is zero by construction: repack/kernels decode the GGML
# wire bytes bit-identically to the golden codecs (tests/test_repack.py,
# test_iq_quant.py), which implement the same public ABI llama.cpp does.
# The SECOND term is exactly what the kernel-vs-dense gate measures — two
# different matmul paths over identical decoded weights — bounded at
# rel < 2e-3 (measured 3e-5..3e-4 across formats).  At the ppl <= 10 of a
# real trained model that is an absolute dppl of 0.02 worst-case / ~0.002
# typical, the same magnitude as llama.cpp's own CPU-vs-CUDA spread; the
# quant-vs-f16 gates below are REGRESSION alarms (a broken decode rule
# lands orders of magnitude above them), not the parity bound itself.

LOWBIT_CAPS = {
    # ~2x the measured rel dppl on this seed/corpus (random weights are
    # the worst case for 2-bit codebooks: measured .137/.063/.016/.311)
    GGMLType.Q2_K: 0.30,
    GGMLType.IQ2_XS: 0.15,
    GGMLType.IQ3_S: 0.05,
    GGMLType.IQ1_S: 0.60,
}


@pytest.fixture(scope="module")
def lowbit_models(tmp_path_factory):
    d = tmp_path_factory.mktemp("pplgate_lb")
    paths = {}
    for q in LOWBIT_CAPS:
        p = d / f"m_{q.name}.gguf"
        write_tiny_llama(p, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
                         ffn_dim=512, quant=q, seed=7)
        paths[q] = p
    return paths


@pytest.mark.parametrize("gtype", list(LOWBIT_CAPS), ids=lambda t: t.name)
def test_dppl_lowbit_quant_vs_f16_gate(models, lowbit_models, gtype):
    ppl_f16 = _ppl(models["F16"])
    ppl_q = _ppl(lowbit_models[gtype])
    rel = abs(ppl_q - ppl_f16) / ppl_f16
    assert rel < LOWBIT_CAPS[gtype], \
        f"{gtype.name}: rel dppl {rel:.4f} (cap {LOWBIT_CAPS[gtype]})"


@pytest.mark.parametrize("gtype", list(LOWBIT_CAPS), ids=lambda t: t.name)
def test_dppl_lowbit_kernel_vs_dense_gate(lowbit_models, gtype):
    """The implementation-vs-implementation numerics bound (see module
    note): same weights, kernel path vs dense-dequant path."""
    ppl_quant = _ppl(lowbit_models[gtype], mode="quant")
    ppl_dense = _ppl(lowbit_models[gtype], mode="dense")
    rel = abs(ppl_quant - ppl_dense) / ppl_dense
    assert rel < 0.002, (gtype.name, ppl_quant, ppl_dense)


def test_dppl_packed4_matches_int8_layout(lowbit_models, monkeypatch):
    """The two IQ device layouts (int8 values / packed4 mapped codes)
    decode identically, so their perplexities must agree to numerics."""
    monkeypatch.setenv("LGT_LAYOUT_CACHE", "0")
    p = lowbit_models[GGMLType.IQ2_XS]
    ppl_int8 = _ppl(p)
    monkeypatch.setenv("LGT_IQ_CODES", "packed4")
    ppl_p4 = _ppl(p)
    assert abs(ppl_p4 - ppl_int8) / ppl_int8 < 0.002, (ppl_int8, ppl_p4)
