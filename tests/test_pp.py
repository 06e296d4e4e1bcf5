"""Pipeline parallelism (parallel/pp.py): stage stacking, GPipe schedule,
logit parity with models.llama.forward on the llama family."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType
from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.parallel.pp import (
    make_pp_mesh, pipeline_utilization, pp_forward, stack_stage_layers,
)
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("pp") / "m.gguf"
    write_tiny_llama(p, dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0)
    cfg, params, r = load_model(str(p), mode="quant")
    r.close()
    return cfg, params


def _reference_logits(cfg, params, tokens):
    B, T = tokens.shape
    cache = KVCache.zeros(cfg, B, T)
    logits, _ = forward(params, cfg, jnp.asarray(tokens),
                        jnp.zeros(B, jnp.int32), cache,
                        jnp.full(B, T, jnp.int32))
    return np.asarray(logits, np.float32)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pp_forward_matches_plain(model, pp, n_micro):
    cfg, params = model
    if len(jax.devices()) < pp:
        pytest.skip("not enough virtual devices")
    rng = np.random.default_rng(0)
    B, T = n_micro * 2, 8
    tokens = rng.integers(3, 60, size=(B, T)).astype(np.int32)
    want = _reference_logits(cfg, params, tokens)
    mesh = make_pp_mesh(pp)
    got = np.asarray(pp_forward(params, cfg, jnp.asarray(tokens), mesh,
                                n_micro))
    # same weights through the same matmul path; attention is the XLA
    # reference einsum on both sides — bf16 activation ordering differs
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)
    # greedy argmax agreement on the last position (the serving-relevant
    # readout), margin-aware: a random tiny model has near-ties within the
    # bf16 re-ordering noise — only a flip across a REAL margin is a bug
    for b in range(got.shape[0]):
        ga, wa = got[b, -1].argmax(), want[b, -1].argmax()
        if ga != wa:
            row = np.sort(want[b, -1])[::-1]
            assert row[0] - row[1] < 0.05, \
                f"argmax flipped across a {row[0] - row[1]:.3f} margin"


def test_stage_stacking_validation(model):
    cfg, params = model
    with pytest.raises(ValueError, match="stages"):
        stack_stage_layers(params["layers"], 3)     # 4 layers, pp=3
    bad = [dict(ly) for ly in params["layers"]]
    bad[1]["experts"] = bad[1]["ffn_gate"]
    with pytest.raises(ValueError):
        stack_stage_layers(bad, 2)


def test_pipeline_utilization_arithmetic():
    assert pipeline_utilization(4, 2) == 4 / 5
    assert pipeline_utilization(8, 4) == 8 / 11
    assert pipeline_utilization(1, 1) == 1.0
