"""Tokenizer tests: SPM merge behavior, byte fallback, BPE, round trips."""

import numpy as np

from llama_gguf_inference_tpu.gguf import GGUFReader
from llama_gguf_inference_tpu.gguf.constants import Keys, TokenType
from llama_gguf_inference_tpu.runtime.tokenizer import (
    BPETokenizer, SpecialTokens, SPMTokenizer, from_gguf_metadata,
)
from llama_gguf_inference_tpu.utils.testing import make_tiny_vocab, write_tiny_llama


def spm():
    tokens, scores, types = make_tiny_vocab()
    return SPMTokenizer(tokens, scores, types,
                        SpecialTokens(bos_id=1, eos_id=2, unk_id=0, add_bos=True))


def test_spm_known_words_roundtrip():
    t = spm()
    ids = t.encode("the quick brown fox")
    assert ids[0] == t.special.bos_id
    assert t.decode(ids) == "the quick brown fox"
    # known words must be single tokens, not byte sequences
    assert len(ids) == 5


def test_spm_merges_subwords():
    t = spm()
    ids = t.encode("hello world", add_bos=False)
    assert t.decode(ids) == "hello world"
    assert ids == [t._index["▁hello"], t._index["▁world"]]


def test_spm_byte_fallback_unicode():
    t = spm()
    text = "héllo ∑"
    ids = t.encode(text, add_bos=False)
    assert t.decode(ids) == text


def test_spm_empty_and_controls():
    t = spm()
    assert t.encode("", add_bos=False) == []
    assert t.decode([1, 2]) == ""     # bos/eos render as nothing
    assert t.is_eog(2)
    assert not t.is_eog(5)


def test_bpe_roundtrip():
    # tiny byte-level BPE vocab: all single bytes + merges for "he", "ll"
    from llama_gguf_inference_tpu.runtime.tokenizer import _bytes_to_unicode
    b2u = _bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    tokens += ["he", "ll", "llo", "Ġhe"]
    types = [int(TokenType.NORMAL)] * len(tokens)
    merges = ["h e", "l l", "ll o", "Ġ he"]
    t = BPETokenizer(tokens, types, merges, SpecialTokens(bos_id=-1, eos_id=-1, add_bos=False))
    ids = t.encode("hello hello")
    assert t.decode(ids) == "hello hello"
    assert t._index["he"] in ids
    assert t._index["llo"] in ids
    assert t._index["Ġhe"] in ids     # space folds into the next word


def test_from_gguf_metadata(tmp_path):
    path = tmp_path / "m.gguf"
    write_tiny_llama(path, dim=32, n_layers=1, n_heads=2, n_kv_heads=1, ffn_dim=48)
    r = GGUFReader(path)
    t = from_gguf_metadata(r.metadata)
    assert isinstance(t, SPMTokenizer)
    ids = t.encode("hello world")
    assert ids[0] == 1
    assert t.decode(ids) == "hello world"
    r.close()


def test_streaming_piece_concat_equals_decode():
    t = spm()
    ids = t.encode("the lazy dog jumps", add_bos=False)
    streamed = "".join(t.piece(i) for i in ids)
    # piece-wise decode loses the leading-space strip; allow leading space
    assert streamed.lstrip(" ") == "the lazy dog jumps"


def test_bpe_streaming_piece_and_piece_bytes():
    """ADVICE r1 high: BPE piece()/piece_bytes() must not TypeError (the
    base-class piece() passes _strip_prefix; BPE generation depends on it)."""
    from llama_gguf_inference_tpu.runtime.tokenizer import _bytes_to_unicode
    b2u = _bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    tokens += ["he", "ll", "llo", "Ġhe"]
    types = [int(TokenType.NORMAL)] * len(tokens)
    merges = ["h e", "l l", "ll o", "Ġ he"]
    t = BPETokenizer(tokens, types, merges,
                     SpecialTokens(bos_id=-1, eos_id=-1, add_bos=False))
    ids = t.encode("hello hello")
    streamed = "".join(t.piece(i) for i in ids)
    assert streamed == "hello hello"
    byte_streamed = b"".join(t.piece_bytes(i) for i in ids)
    assert byte_streamed.decode("utf-8") == "hello hello"
