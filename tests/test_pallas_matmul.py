"""Pallas fused dequant+matmul vs the XLA reference path.

Runs in interpret mode on CPU (exact same kernel math as TPU lowering);
per-quant-type numeric parity gates per SURVEY.md §7 step 3.
"""

import numpy as np
import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.ops.pallas_matmul import pallas_quant_matmul
from llama_gguf_inference_tpu.quant import quantize
from llama_gguf_inference_tpu.quant.repack import repack, to_quant_linear

FORMATS = [
    GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS,
]


def _weight(gtype, out_f, in_f, rng):
    x = rng.normal(size=(out_f, in_f)).astype(np.float32)
    raw = quantize(x, gtype)
    return to_quant_linear(repack(raw, gtype, out_f, in_f))


@pytest.mark.parametrize("gtype", FORMATS, ids=lambda t: t.name)
def test_kernel_matches_xla(gtype, rng):
    out_f, in_f = 256, 512
    ql = _weight(gtype, out_f, in_f, rng)
    x = rng.normal(size=(4, in_f)).astype(np.float32)

    import jax.numpy as jnp
    want = np.asarray(ql.matmul_xla(jnp.asarray(x, jnp.bfloat16)))
    got = np.asarray(pallas_quant_matmul(ql, jnp.asarray(x, jnp.bfloat16)))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2, \
        f"{gtype.name}: rel err {np.abs(got - want).max() / scale}"


@pytest.mark.parametrize("rows", [1, 3, 8, 17])
def test_kernel_row_padding(rows, rng):
    """Odd row counts (decode batch sizes) pad correctly."""
    import jax.numpy as jnp
    ql = _weight(GGMLType.Q4_K, 128, 256, rng)
    x = rng.normal(size=(rows, 256)).astype(np.float32)
    want = np.asarray(ql.matmul_xla(jnp.asarray(x, jnp.bfloat16)))
    got = np.asarray(pallas_quant_matmul(ql, jnp.asarray(x, jnp.bfloat16)))
    assert got.shape == (rows, 128)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2


def test_kernel_3d_input(rng):
    import jax.numpy as jnp
    ql = _weight(GGMLType.Q8_0, 128, 256, rng)
    x = rng.normal(size=(2, 5, 256)).astype(np.float32)
    got = np.asarray(pallas_quant_matmul(ql, jnp.asarray(x, jnp.bfloat16)))
    assert got.shape == (2, 5, 128)
    want = np.asarray(ql.matmul_xla(jnp.asarray(x, jnp.bfloat16)))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2


def test_fallback_on_untileable_shapes(rng):
    """out_features not divisible by 8 -> clean XLA fallback."""
    import jax.numpy as jnp
    ql = _weight(GGMLType.Q8_0, 120, 256, rng)   # 120 not divisible by 16
    x = rng.normal(size=(2, 256)).astype(np.float32)
    got = np.asarray(pallas_quant_matmul(ql, jnp.asarray(x, jnp.bfloat16)))
    assert got.shape == (2, 120)


FOUR_BIT = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q3_K, GGMLType.Q4_K]


@pytest.mark.parametrize("variant", ["xsum", "split", "fsplit", "int8"])
@pytest.mark.parametrize("gtype", FOUR_BIT, ids=lambda t: t.name)
def test_variant_kernels_match_xla(gtype, variant, rng, monkeypatch):
    """4-bit variant kernels (round-2 bandwidth work) vs the XLA reference.

    int8 re-quantizes activations per 32-block (Q8_1 style), so its
    tolerance is wider — it trades ~0.4% activation rounding for an
    integer-MXU data path (llama.cpp's vec_dot_q makes the same trade).
    """
    monkeypatch.setenv("LGT_MM_VARIANT", variant)
    out_f, in_f = 256, 512
    ql = _weight(gtype, out_f, in_f, rng)
    x = rng.normal(size=(4, in_f)).astype(np.float32)

    import jax.numpy as jnp
    want = np.asarray(ql.matmul_xla(jnp.asarray(x, jnp.bfloat16)))
    got = np.asarray(pallas_quant_matmul(ql, jnp.asarray(x, jnp.bfloat16)))
    scale = np.abs(want).max() + 1e-6
    tol = 3e-2 if variant == "int8" else 2e-2
    assert np.abs(got - want).max() / scale < tol, \
        f"{gtype.name}/{variant}: rel err {np.abs(got - want).max() / scale}"


def test_large_batch_vmem_gated(rng, monkeypatch):
    """Prefill-sized batches use the Pallas kernels only while the (B, in)
    activation tile fits LGT_MM_X_VMEM — B=512 x in=14336 blows the VMEM
    scoped budget (observed on v5e), but small-in prefills must NOT fall
    to the XLA path: its bf16 weight-dequant transients ResourceExhaust
    the chip at high residency (r4 spec-bench/MoE OOMs)."""
    import jax.numpy as jnp

    from llama_gguf_inference_tpu.ops import pallas_matmul as pm

    calls = {"pallas": 0}
    orig = pm._quant_matmul_2d_xsum

    def spy(*a, **kw):
        calls["pallas"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(pm, "_quant_matmul_2d_xsum", spy)
    ql = _weight(GGMLType.Q4_K, 128, 256, rng)

    x_small = jnp.asarray(rng.normal(size=(4, 256)), jnp.bfloat16)
    pm.pallas_quant_matmul(ql, x_small)
    assert calls["pallas"] == 1

    # B=128 x in=256 fits the default budget -> stays on the kernels
    x_prefill = jnp.asarray(rng.normal(size=(128, 256)), jnp.bfloat16)
    got = np.asarray(pm.pallas_quant_matmul(ql, x_prefill))
    assert calls["pallas"] == 2
    want = np.asarray(ql.matmul_xla(x_prefill))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2

    # shrinking the budget reroutes the same shape to the XLA path
    monkeypatch.setenv("LGT_MM_X_VMEM", "1024")
    got2 = np.asarray(pm.pallas_quant_matmul(ql, x_prefill))
    assert calls["pallas"] == 2          # unchanged: took the XLA path
    assert np.abs(got2 - want).max() / scale < 2e-2


NATIVE_LOWBIT = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                 GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
                 GGMLType.IQ1_M, GGMLType.Q2_K]


@pytest.mark.parametrize("iq_codes", ["int8", "packed4"])
@pytest.mark.parametrize("gtype", NATIVE_LOWBIT, ids=lambda t: t.name)
def test_native_lowbit_kernels_match_xla(gtype, iq_codes, rng, monkeypatch):
    """Low-bit kernels (r4): Q2_K/IQ1 stream 2-bit codes through the
    quarter-split kernel; IQ2/IQ3 default to int8 values (8-bit chain,
    fastest measured) and opt into 4-bit sign|mag codes + the in-kernel
    code->value map under LGT_IQ_CODES=packed4 (minimum footprint).
    Every combination must match the XLA reference path."""
    from llama_gguf_inference_tpu.ops import pallas_matmul as pm

    monkeypatch.setenv("LGT_IQ_CODES", iq_codes)
    used = {}
    orig = pm._quant_matmul_2d_xsum

    def spy(*a, **kw):
        used["kern"] = kw.get("kern")
        return orig(*a, **kw)

    monkeypatch.setattr(pm, "_quant_matmul_2d_xsum", spy)
    out_f, in_f = 256, 512
    ql = _weight(gtype, out_f, in_f, rng)
    x = rng.normal(size=(4, in_f)).astype(np.float32)

    import jax.numpy as jnp
    want = np.asarray(ql.matmul_xla(jnp.asarray(x, jnp.bfloat16)))
    got = np.asarray(pallas_quant_matmul(ql, jnp.asarray(x, jnp.bfloat16)))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2, \
        f"{gtype.name}: rel err {np.abs(got - want).max() / scale}"
    if ql.bits == 2:
        assert used["kern"] == "qsplit"
    elif ql.bits == 4:
        assert used["kern"] == "fsplit"      # mapped codes force fsplit
    else:
        assert "kern" not in used            # int8 values: base 8-bit chain


def test_native_lowbit_density(monkeypatch):
    """The on-device arrays of the IQ/2-bit formats must stay at native
    code width (VERDICT r3 #1 — IQ2_XS streamed ~10 bpw of int8 codes
    before r4).  Default ``auto`` layout is speed-first (flat f32
    sub-scales — the r4 A/B probe measured the in-kernel compact
    expansion costing more than the bytes it saves); pinned per format
    for both the default and the minimum-footprint
    ``LGT_SCALE_LAYOUT=compact`` mode."""
    # default: IQ2/IQ3 int8 values + compact scales (fastest measured);
    # Q2_K/IQ1_S 2-bit + flat scales
    default_bpw = {GGMLType.IQ2_XXS: 8.4, GGMLType.IQ2_XS: 8.7,
                   GGMLType.IQ2_S: 8.7, GGMLType.IQ3_XXS: 8.4,
                   GGMLType.IQ3_S: 8.4, GGMLType.IQ1_S: 4.1,
                   GGMLType.IQ1_M: 10.1, GGMLType.Q2_K: 6.1}
    # packed4 + compact: minimum-footprint mode
    min_bpw = {GGMLType.IQ2_XXS: 4.4, GGMLType.IQ2_XS: 4.7,
               GGMLType.IQ2_S: 4.7, GGMLType.IQ3_XXS: 4.4,
               GGMLType.IQ3_S: 4.4, GGMLType.IQ1_S: 2.8,
               GGMLType.IQ1_M: 4.3, GGMLType.Q2_K: 3.3}
    rng = np.random.default_rng(7)
    out_f, in_f = 8, 1024
    for mode, caps in (((None, None), default_bpw),
                       (("packed4", "compact"), min_bpw)):
        iq_codes, layout = mode
        for var, val in (("LGT_IQ_CODES", iq_codes),
                         ("LGT_SCALE_LAYOUT", layout)):
            if val:
                monkeypatch.setenv(var, val)
            else:
                monkeypatch.delenv(var, raising=False)
        for gtype in NATIVE_LOWBIT:
            x = rng.normal(size=(out_f, in_f)).astype(np.float32)
            ql = to_quant_linear(repack(quantize(x, gtype), gtype,
                                        out_f, in_f))
            dev = sum(int(np.asarray(a).nbytes)
                      for a in (ql.codes, ql.d, ql.sc, ql.dmin, ql.mn)
                      if a is not None)
            bpw = dev * 8 / (out_f * in_f)
            assert bpw <= caps[gtype], \
                f"{gtype.name} {iq_codes or 'default'}: {bpw:.2f} bpw"
