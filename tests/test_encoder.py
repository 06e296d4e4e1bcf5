"""BERT-family encoder (embedding models): HF parity, WordPiece tokenizer
parity, and the embedding-only serving surface.

The reference serves embedding GGUFs (nomic-embed and friends) through
llama-server's ``--embedding`` mode reached via ``EXTRA_ARGS``
(reference ``scripts/start.sh:490-494``) and the verbatim /v1/embeddings
proxy (``scripts/gateway.py:807``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from llama_gguf_inference_tpu.tools.convert_hf import convert


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bert") / "tiny-bert"
    cfg = transformers.BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, layer_norm_eps=1e-12,
        type_vocab_size=2)
    torch.manual_seed(11)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=False)
    # WordPiece vocab.txt: specials + ascii pieces covering the test text
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + ["hello", "world", "quick", "brown", "fox", "jumps",
                "the", "over", "lazy", "dog", ".", ",", "un", "##believ",
                "##able", "##s", "he", "##llo"]
             + [f"tok{i}" for i in range(177)])
    (d / "vocab.txt").write_text("\n".join(vocab[:200]) + "\n",
                                 encoding="utf-8")
    return d, model


def _hf_embed(model, ids):
    with torch.no_grad():
        h = model(torch.tensor([ids])).last_hidden_state[0].numpy()
    pooled = h.mean(axis=0)
    return pooled / np.linalg.norm(pooled)


def test_encoder_hf_parity(bert_dir, tmp_path):
    """convert -> load_encoder -> encoder_forward must match transformers'
    BertModel (mean-pooled, L2-normalized) on the same token ids."""
    from llama_gguf_inference_tpu.models.encoder import encoder_forward
    from llama_gguf_inference_tpu.runtime.loader import load_encoder

    d, model = bert_dir
    dst = tmp_path / "bert.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)
    cfg, params, reader = load_encoder(dst, mode="dense")
    reader.close()
    assert cfg.arch == "bert" and cfg.n_layers == 2 and cfg.dim == 64

    rng = np.random.default_rng(3)
    ids = [2] + list(rng.integers(5, 199, size=10)) + [3]   # [CLS] .. [SEP]
    want = _hf_embed(model, ids)

    T = 16
    tok = np.zeros((1, T), np.int32)
    tok[0, : len(ids)] = ids
    got = np.asarray(encoder_forward(
        params, cfg, jnp.asarray(tok),
        jnp.asarray([len(ids)], jnp.int32)))[0]
    np.testing.assert_allclose(got, want, atol=2e-2)
    # padding must not leak into the pooled embedding
    tok2 = np.full((1, T), 7, np.int32)
    tok2[0, : len(ids)] = ids
    got2 = np.asarray(encoder_forward(
        params, cfg, jnp.asarray(tok2),
        jnp.asarray([len(ids)], jnp.int32)))[0]
    np.testing.assert_allclose(got2, got, atol=1e-5)


def test_wordpiece_matches_transformers(bert_dir, tmp_path):
    """Our WordPiece (greedy longest-prefix + BasicTokenizer normalization)
    must produce transformers.BertTokenizer's ids on plain ASCII text."""
    from llama_gguf_inference_tpu.gguf.reader import GGUFReader
    from llama_gguf_inference_tpu.runtime import tokenizer as tok_mod

    d, _ = bert_dir
    dst = tmp_path / "bert.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)
    reader = GGUFReader(dst)
    ours = tok_mod.from_gguf_metadata(reader.metadata)
    reader.close()
    hf = transformers.BertTokenizer(str(d / "vocab.txt"), do_lower_case=True)

    for text in ("Hello world.", "The quick brown fox jumps over the lazy dog",
                 "unbelievable worlds, hello", "HELLO, WORLD."):
        want = hf(text)["input_ids"]
        got = ours.encode(text)
        assert got == want, (text, got, want)


def test_encoder_engine_embeddings(bert_dir, tmp_path):
    """EncoderEngine: embed() works (cosine-sane), generation submit()
    yields one terminal error event (llama-server --embedding behavior)."""
    from llama_gguf_inference_tpu.runtime.encoder_engine import EncoderEngine
    from llama_gguf_inference_tpu.runtime.sampler import SamplingParams

    d, model = bert_dir
    dst = tmp_path / "bert.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)
    eng = EncoderEngine(str(dst), buckets=(16, 32), mode="dense")
    eng.start()
    try:
        v1, n1 = eng.embed("hello world")
        assert n1 >= 3 and abs(np.linalg.norm(v1) - 1.0) < 1e-3
        # matches transformers end-to-end (text -> ids -> embed)
        hf_tok = transformers.BertTokenizer(str(d / "vocab.txt"))
        ids = hf_tok("hello world")["input_ids"]
        want = _hf_embed(model, ids)
        np.testing.assert_allclose(np.asarray(v1), want, atol=2e-2)
        # similar texts are closer than dissimilar ones
        v2, _ = eng.embed("hello world.")
        v3, _ = eng.embed("the lazy dog jumps")
        cos = lambda a, b: float(np.dot(a, b))
        assert cos(v1, v2) > cos(v1, v3)

        _, out = eng.submit("hello", SamplingParams(max_tokens=4))
        ev = out.get(timeout=5)
        assert ev.finished and ev.finish_reason == "error"
        assert "embedding-only" in ev.text
    finally:
        eng.stop()


def test_encoder_serving_stack(bert_dir, tmp_path, monkeypatch):
    """openai_server routes a bert GGUF to EncoderEngine: /v1/embeddings
    and /v1/rerank serve, chat/completions return the contract error."""
    import asyncio
    import json as json_mod
    import urllib.request

    from llama_gguf_inference_tpu.serving.openai_server import (
        BackendConfig, OpenAIServer, build_engine_from_env,
    )

    d, _ = bert_dir
    dst = tmp_path / "bert.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)
    monkeypatch.setenv("MODEL_PATH", str(dst))
    monkeypatch.delenv("MOCK_BACKEND", raising=False)
    engine = build_engine_from_env()
    from llama_gguf_inference_tpu.runtime.encoder_engine import EncoderEngine
    assert isinstance(engine, EncoderEngine)

    async def drive():
        engine.start()
        srv = OpenAIServer(engine, BackendConfig(host="127.0.0.1", port=0))
        await srv.start()
        port = srv.port
        loop = asyncio.get_running_loop()

        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json_mod.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, json_mod.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json_mod.loads(e.read() or b"{}")

        code, emb = await loop.run_in_executor(
            None, post, "/v1/embeddings", {"input": "hello world"})
        assert code == 200
        assert len(emb["data"][0]["embedding"]) == 64

        code, rr = await loop.run_in_executor(
            None, post, "/v1/rerank",
            {"query": "hello world",
             "documents": ["hello world.", "the lazy dog"]})
        assert code == 200 and len(rr["results"]) == 2
        assert rr["results"][0]["index"] == 0   # near-duplicate ranks first

        code, err = await loop.run_in_executor(
            None, post, "/v1/chat/completions",
            {"model": "m", "messages": [{"role": "user", "content": "hi"}],
             "max_tokens": 4})
        assert code >= 400 and "error" in err
        await srv.close()

    asyncio.run(drive())


def test_pooling_type_none_rejected():
    """pooling_type 0 (per-token embeddings) must be rejected, not silently
    aliased to mean — llama-server returns a different response shape for
    it (advisor finding r3)."""
    from llama_gguf_inference_tpu.models.encoder import EncoderConfig

    md = {"general.architecture": "bert", "bert.embedding_length": 64,
          "bert.attention.head_count": 4, "bert.block_count": 2,
          "bert.feed_forward_length": 128, "bert.context_length": 64,
          "bert.vocab_size": 200, "bert.pooling_type": 0}
    with pytest.raises(ValueError, match="pooling_type 0"):
        EncoderConfig.from_gguf_metadata(md)
    assert EncoderConfig.from_gguf_metadata(
        {**md, "bert.pooling_type": 2}).pooling == "cls"


def test_overlong_input_keeps_sep_frame(bert_dir, tmp_path):
    """Clipping an overlong input truncates CONTENT and keeps the trailing
    [SEP], matching HF/llama.cpp truncation (advisor finding r3)."""
    from llama_gguf_inference_tpu.runtime.encoder_engine import EncoderEngine

    d, _ = bert_dir
    dst = tmp_path / "bert.gguf"
    convert(str(d), str(dst), dtype="f32", verbose=False)
    eng = EncoderEngine(str(dst), buckets=(16,), mode="dense")
    seen = {}
    real_fwd = eng._fwd

    def spy(params, cfg, tok, lengths):
        seen["ids"] = np.asarray(tok)[0][: int(np.asarray(lengths)[0])]
        return real_fwd(params, cfg, tok, lengths)

    eng._fwd = spy
    _, n = eng.embed("hello world " * 40)
    sep = eng.tokenizer.special.eos_id
    cls = eng.tokenizer.special.bos_id
    assert n == 16
    ids = seen["ids"]
    assert len(ids) == 16 and ids[0] == cls and ids[-1] == sep
