"""External parity: convert a transformers Llama -> GGUF -> our engine, and
compare logits against transformers' own forward pass.

This is the strongest correctness gate in the suite: it validates weight
orientation, the Q/K rope permutation (HF half-split vs GGUF interleaved),
RMSNorm/SwiGLU conventions, and GQA — against an independent implementation.
(Replaces the llama.cpp CPU parity of BASELINE config 1; llama.cpp is not
available in this environment.)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from llama_gguf_inference_tpu.models.llama import KVCache, forward
from llama_gguf_inference_tpu.runtime.loader import load_model
from llama_gguf_inference_tpu.tools.convert_hf import convert


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf") / "tiny-llama-hf"
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=False)
    return d, model


def test_hf_logit_parity(hf_model_dir, tmp_path):
    d, model = hf_model_dir
    dst = tmp_path / "converted.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)

    cfg, params, reader = load_model(dst, mode="dense")
    reader.close()
    assert cfg.n_layers == 2 and cfg.n_kv_heads == 2

    # f32-activation oracle mode: the embedding dtype sets the activation
    # dtype for the whole graph (rms_norm/matmul/rope preserve x.dtype).
    # Serving runs bf16 activations; the parity oracle compares f32-vs-f32
    # against transformers' f32 forward.
    params["tok_embd"] = params["tok_embd"].astype(jnp.float32)

    ids = np.array([[5, 100, 42, 7, 199, 23]], dtype=np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()[0]

    cache = KVCache.zeros(cfg, 1, 16)
    logits, _ = forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                        jnp.zeros(1, jnp.int32), cache,
                        jnp.full(1, ids.shape[1], jnp.int32))
    got = np.asarray(logits)[0]

    # dense path runs bf16 weights; check argmax chain + close logits
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    denom = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / denom < 0.03


def test_hf_greedy_decode_parity(hf_model_dir, tmp_path):
    """Token-by-token greedy decode must match transformers.generate."""
    d, model = hf_model_dir
    dst = tmp_path / "c2.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)
    cfg, params, reader = load_model(dst, mode="dense")
    reader.close()

    prompt = np.array([[5, 100, 42]], dtype=np.int64)
    n_new = 8
    with torch.no_grad():
        hf_out = model.generate(torch.from_numpy(prompt), max_new_tokens=n_new,
                                do_sample=False).numpy()[0, prompt.shape[1]:]

    cache = KVCache.zeros(cfg, 1, 32)
    ids = prompt.astype(np.int32)
    ours = []
    offset = 0
    chunk = jnp.asarray(ids)
    for _ in range(n_new):
        T = chunk.shape[1]
        logits, cache = forward(params, cfg, chunk,
                                jnp.full(1, offset, jnp.int32), cache,
                                jnp.full(1, T, jnp.int32))
        nxt = int(np.asarray(logits)[0, T - 1].argmax())
        ours.append(nxt)
        offset += T
        chunk = jnp.asarray(np.array([[nxt]], np.int32))
    assert ours == hf_out.tolist()
