"""UTF-8 boundary holdback in streaming (found live: byte-fallback tokens
split multi-byte sequences, corrupting SSE deltas)."""

from llama_gguf_inference_tpu.runtime.engine import _utf8_split
from llama_gguf_inference_tpu.runtime.tokenizer import SpecialTokens, SPMTokenizer
from llama_gguf_inference_tpu.utils.testing import make_tiny_vocab


def test_utf8_split_complete():
    text, rest = _utf8_split("héllo".encode())
    assert text == "héllo" and rest == b""


def test_utf8_split_partial_holdback():
    full = "é".encode()          # 2 bytes
    text, rest = _utf8_split(full[:1])
    assert text == "" and rest == full[:1]
    text, rest = _utf8_split(rest + full[1:])
    assert text == "é" and rest == b""


def test_utf8_split_4byte_emoji():
    emoji = "🎉".encode()        # 4 bytes
    buf = b""
    out = ""
    for b in emoji:
        buf += bytes([b])
        text, buf = _utf8_split(buf)
        out += text
    assert out == "🎉" and buf == b""


def test_utf8_split_flush_and_garbage():
    text, rest = _utf8_split(b"\xe2\x82", flush=True)   # incomplete, flushed
    assert rest == b"" and "�" in text
    text, rest = _utf8_split(b"\xff\xff\xff\xff\xff")    # invalid, not partial
    assert rest == b"" and text.count("�") >= 1


def test_piece_bytes_roundtrip_through_byte_tokens():
    tokens, scores, types = make_tiny_vocab()
    t = SPMTokenizer(tokens, scores, types,
                     SpecialTokens(bos_id=1, eos_id=2, unk_id=0))
    ids = t.encode("naïve 🎉", add_bos=False)
    # simulate the streaming emitter
    buf = b""
    out = ""
    for i in ids:
        buf += t.piece_bytes(i)
        text, buf = _utf8_split(buf)
        out += text
    text, _ = _utf8_split(buf, flush=True)
    out += text
    assert out.lstrip(" ") == "naïve 🎉"
    assert "�" not in out
