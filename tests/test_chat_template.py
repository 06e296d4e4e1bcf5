"""Chat-template rendering tests (jinja GGUF templates + fallback)."""

from llama_gguf_inference_tpu.serving.chat_template import (
    normalize_messages, render_chat,
)

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
]


def test_chatml_fallback():
    out = render_chat(MSGS)
    assert "<|im_start|>system\nYou are helpful.<|im_end|>" in out
    assert "<|im_start|>user\nHi<|im_end|>" in out
    assert out.endswith("<|im_start|>assistant\n")


def test_no_generation_prompt():
    out = render_chat(MSGS, add_generation_prompt=False)
    assert not out.endswith("assistant\n")


def test_llama2_style_template():
    tpl = ("{% for m in messages %}"
           "{% if m['role'] == 'user' %}[INST] {{ m['content'] }} [/INST]"
           "{% else %}{{ m['content'] }}{% endif %}"
           "{% endfor %}")
    out = render_chat([{"role": "user", "content": "Q1"},
                       {"role": "assistant", "content": "A1"},
                       {"role": "user", "content": "Q2"}], tpl)
    assert out == "[INST] Q1 [/INST]A1[INST] Q2 [/INST]"


def test_llama3_style_template_with_bos():
    tpl = ("{{ bos_token }}{% for m in messages %}"
           "<|start_header_id|>{{ m['role'] }}<|end_header_id|>\n\n"
           "{{ m['content'] }}<|eot_id|>{% endfor %}"
           "{% if add_generation_prompt %}"
           "<|start_header_id|>assistant<|end_header_id|>\n\n{% endif %}")
    out = render_chat(MSGS, tpl, bos_token="<|begin_of_text|>")
    assert out.startswith("<|begin_of_text|><|start_header_id|>system")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_broken_template_falls_back():
    out = render_chat(MSGS, "{% this is not jinja %}")
    assert "<|im_start|>user\nHi<|im_end|>" in out


def test_normalize_typed_content_parts():
    msgs = [{"role": "user", "content": [
        {"type": "text", "text": "part one "},
        {"type": "image_url", "image_url": {"url": "x"}},
        {"type": "text", "text": "part two"},
    ]}]
    norm = normalize_messages(msgs)
    assert norm == [{"role": "user", "content": "part one part two"}]


def test_raise_exception_template_falls_back():
    tpl = "{{ raise_exception('unsupported role') }}"
    out = render_chat(MSGS, tpl)      # error -> chatml fallback
    assert "<|im_start|>" in out


def test_sandbox_blocks_python_internals():
    """ADVICE r1 high: GGUF templates are untrusted — attribute chains that
    reach Python internals must not execute (sandboxed env -> fallback)."""
    evil = ("{{ messages.__class__.__mro__[1].__subclasses__() }}")
    out = render_chat(MSGS, evil)
    assert "subclasses" not in out
    assert "<class" not in out
    assert "<|im_start|>user\nHi<|im_end|>" in out  # chatml fallback


def test_sandbox_blocks_attribute_mutation():
    evil = "{% set x = messages.__init__.__globals__ %}{{ x }}"
    out = render_chat(MSGS, evil)
    assert "__builtins__" not in out
    assert "<|im_start|>" in out
