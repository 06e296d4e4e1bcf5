"""JAX Llama graph vs independent numpy reference + KV-cache consistency."""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_gguf_inference_tpu.gguf import GGMLType, GGUFReader
from llama_gguf_inference_tpu.models.config import ModelConfig
from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

from np_reference_model import forward_np


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.F32)
    return path


def _np_weights(path):
    r = GGUFReader(path)
    return {name: r.tensor_f32(name).astype(np.float64) for name in r.tensors}


def test_forward_matches_numpy_reference(tiny_model):
    cfg, params, reader = load_model(tiny_model, mode="dense")
    ids = np.array([1, 263, 270, 275, 268], dtype=np.int32)  # arbitrary valid ids
    T = len(ids)

    want = forward_np(_np_weights(tiny_model), cfg, ids)

    cache = KVCache.zeros(cfg, batch=1, max_seq=16)
    logits, _ = forward(params, cfg, ids[None, :],
                        offsets=jnp.zeros(1, jnp.int32), cache=cache,
                        lengths=jnp.array([T], jnp.int32))
    got = np.asarray(logits)[0]
    # dense path runs bf16 weights; tolerance accounts for bf16 rounding
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    # the argmax chain (what greedy decode consumes) must agree exactly
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_prefill_equals_incremental_decode(tiny_model):
    cfg, params, _ = load_model(tiny_model, mode="dense")
    ids = np.array([1, 263, 270, 275, 268, 280], dtype=np.int32)
    T = len(ids)
    S = 16

    cache = KVCache.zeros(cfg, batch=1, max_seq=S)
    full_logits, _ = forward(params, cfg, ids[None, :],
                             offsets=jnp.zeros(1, jnp.int32), cache=cache,
                             lengths=jnp.array([T], jnp.int32))
    full_logits = np.asarray(full_logits)[0]

    cache = KVCache.zeros(cfg, batch=1, max_seq=S)
    step_logits = []
    for t in range(T):
        lg, cache = forward(params, cfg, ids[None, t:t + 1],
                            offsets=jnp.array([t], jnp.int32), cache=cache,
                            lengths=jnp.array([1], jnp.int32))
        step_logits.append(np.asarray(lg)[0, 0])
    step_logits = np.stack(step_logits)
    np.testing.assert_allclose(step_logits, full_logits, atol=1e-3, rtol=1e-3)


def test_batched_offsets_isolation(tiny_model):
    """Two sequences at different cache offsets must not interact."""
    cfg, params, _ = load_model(tiny_model, mode="dense")
    S = 16
    a = np.array([1, 263, 270], dtype=np.int32)
    b = np.array([1, 275, 268, 280], dtype=np.int32)

    # run a alone
    cache1 = KVCache.zeros(cfg, batch=1, max_seq=S)
    la, _ = forward(params, cfg, a[None], jnp.zeros(1, jnp.int32), cache1,
                    jnp.array([3], jnp.int32))
    # run a and b batched with right-padding on a
    cache2 = KVCache.zeros(cfg, batch=2, max_seq=S)
    batch_ids = np.zeros((2, 4), np.int32)
    batch_ids[0, :3] = a
    batch_ids[1, :4] = b
    lab, _ = forward(params, cfg, jnp.asarray(batch_ids),
                     jnp.zeros(2, jnp.int32), cache2,
                     jnp.array([3, 4], jnp.int32))
    np.testing.assert_allclose(np.asarray(lab)[0, :3], np.asarray(la)[0],
                               atol=1e-3, rtol=1e-3)


def test_quant_mode_close_to_dense(tiny_model, tmp_path):
    path = tmp_path / "q8.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q8_0)
    cfg, params_q, _ = load_model(path, mode="quant")
    _, params_d, _ = load_model(path, mode="dense")
    ids = jnp.asarray(np.array([[1, 263, 270, 275]], dtype=np.int32))
    cache = KVCache.zeros(cfg, batch=1, max_seq=8)
    lq, _ = forward(params_q, cfg, ids, jnp.zeros(1, jnp.int32), cache,
                    jnp.array([4], jnp.int32))
    ld, _ = forward(params_d, cfg, ids, jnp.zeros(1, jnp.int32), cache,
                    jnp.array([4], jnp.int32))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(ld), atol=0.05, rtol=0.05)


def test_moe_forward_runs(tmp_path):
    path = tmp_path / "moe.gguf"
    write_tiny_llama(path, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, n_experts=4, n_experts_used=2)
    cfg, params, _ = load_model(path, mode="dense")
    assert cfg.is_moe
    ids = jnp.asarray(np.array([[1, 263, 270]], dtype=np.int32))
    cache = KVCache.zeros(cfg, batch=1, max_seq=8)
    logits, _ = forward(params, cfg, ids, jnp.zeros(1, jnp.int32), cache,
                        jnp.array([3], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_rope_scaling_llama3():
    """llama3 rope scaling: long wavelengths interpolated, short untouched."""
    import jax.numpy as jnp
    from llama_gguf_inference_tpu.models.config import ModelConfig
    from llama_gguf_inference_tpu.models.llama import rope_angles

    pos = jnp.asarray(np.array([[5000, 9000, 12000, 16000]]), jnp.int32)
    base_cfg = ModelConfig(rope_scaling_type="none")
    sc_cfg = ModelConfig(rope_scaling_type="llama3", rope_scaling_factor=8.0,
                         rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
                         rope_orig_ctx=8192)
    c0, s0 = rope_angles(pos, 128, 128, 500000.0, base_cfg)
    c1, s1 = rope_angles(pos, 128, 128, 500000.0, sc_cfg)
    c0, c1 = np.asarray(c0), np.asarray(c1)
    # highest-frequency dims (short wavelength) unchanged
    np.testing.assert_allclose(c1[..., 0], c0[..., 0], rtol=1e-6)
    # lowest-frequency dims scaled (angles shrink by ~factor)
    assert not np.allclose(c1[..., -1], c0[..., -1])


def test_rope_scaling_linear():
    import jax.numpy as jnp
    from llama_gguf_inference_tpu.models.config import ModelConfig
    from llama_gguf_inference_tpu.models.llama import rope_angles

    pos = jnp.asarray(np.array([[8]]), jnp.int32)
    cfg = ModelConfig(rope_scaling_type="linear", rope_scaling_factor=4.0)
    c1, s1 = rope_angles(pos, 64, 64, 10000.0, cfg)
    c0, s0 = rope_angles(jnp.asarray(np.array([[2]]), jnp.int32), 64, 64,
                         10000.0, None)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=1e-6)


def test_missing_required_norm_fails_at_load(tmp_path):
    """A truncated GGUF (required pre-norm tensor absent) must fail at load
    for arches that need it — not silently skip the norm in forward()."""
    from llama_gguf_inference_tpu.gguf import GGMLType, GGUFReader
    from llama_gguf_inference_tpu.gguf.writer import GGUFWriter

    src = tmp_path / "ok.gguf"
    write_tiny_llama(src, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
                     ffn_dim=128)
    r = GGUFReader(src)
    bad = tmp_path / "truncated.gguf"
    w = GGUFWriter(bad)
    for k, v in r.metadata.items():
        w.add(k, v)
    for name in r.tensors:
        if name == "blk.0.ffn_norm.weight":
            continue
        w.add_tensor(name, np.asarray(r.tensor_f32(name)), GGMLType.F32)
    r.close()
    w.write()
    with pytest.raises(KeyError, match="ffn_norm"):
        load_model(bad, mode="dense")
