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
