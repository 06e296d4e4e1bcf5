"""Auth validator unit tests (contract: reference scripts/auth.py, SURVEY §2.2)."""

import time

import pytest

from llama_gguf_inference_tpu.serving.auth import (
    AccessLogger, APIKeyValidator, parse_expiration_ts,
)

VALID_KEY = "sk-test-" + "a" * 24          # 31 chars, passes 16-128 format


@pytest.fixture
def keys_file(tmp_path):
    p = tmp_path / "api_keys.txt"
    p.write_text(
        "# comment line\n"
        f"prod:{VALID_KEY}\n"
        f"limited:sk-limited-{'b' * 24}:2\n"
        f"expired:sk-expired-{'c' * 24}::2020-01-01\n"
        "malformed line without colon\n"
        "bad key id!!:sk-okkey-{'d' * 24}\n"
        "shortkey:tooshort\n"
    )
    return str(p)


def test_load_and_validate(keys_file):
    v = APIKeyValidator(keys_file, enabled=True)
    assert v.n_keys == 3  # prod, limited, expired; malformed lines skipped
    res = v.validate({"authorization": f"Bearer {VALID_KEY}"})
    assert res.ok and res.key_id == "prod"
    # bearer prefix optional
    assert v.validate({"authorization": VALID_KEY}).ok


def test_missing_empty_invalid(keys_file):
    v = APIKeyValidator(keys_file, enabled=True)
    r = v.validate({})
    assert not r.ok and r.status == 401 and r.message == "Missing Authorization header"
    r = v.validate({"authorization": "Bearer "})
    assert not r.ok and r.message == "Empty Authorization header"
    r = v.validate({"authorization": "Bearer $$$invalid$$$chars$$$"})
    assert not r.ok and r.message == "Invalid API key format"
    r = v.validate({"authorization": "Bearer sk-wrong-" + "z" * 24})
    assert not r.ok and r.message == "Invalid API key"


def test_fail_closed_no_keys(tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("# nothing\n")
    v = APIKeyValidator(str(p), enabled=True)
    r = v.validate({"authorization": f"Bearer {VALID_KEY}"})
    assert not r.ok
    assert "misconfigured" in r.message


def test_disabled_auth_allows_all():
    v = APIKeyValidator(None, enabled=False)
    assert v.validate({}).ok


def test_rate_limit_sliding_window(keys_file):
    v = APIKeyValidator(keys_file, enabled=True)
    key = f"sk-limited-{'b' * 24}"
    h = {"authorization": f"Bearer {key}"}
    assert v.validate(h).ok
    assert v.validate(h).ok
    r = v.validate(h)
    assert not r.ok and r.status == 429 and r.code == "rate_limit_exceeded"


def test_expired_key(keys_file):
    v = APIKeyValidator(keys_file, enabled=True)
    r = v.validate({"authorization": f"Bearer sk-expired-{'c' * 24}"})
    assert not r.ok and r.message == "API key expired"


def test_reload_preserves_rate_windows(keys_file, tmp_path):
    v = APIKeyValidator(keys_file, enabled=True)
    key = f"sk-limited-{'b' * 24}"
    h = {"authorization": f"Bearer {key}"}
    v.validate(h)
    v.validate(h)
    n = v.reload_keys(keys_file)
    assert n == 3
    # still rate limited — window survived the reload
    assert not v.validate(h).ok


def test_parse_expiration():
    assert parse_expiration_ts("2020-01-01") is not None
    assert parse_expiration_ts("2030-06-15T12:30:00Z") is not None
    assert parse_expiration_ts("not-a-date") is None
    assert parse_expiration_ts("") is None


def test_access_logger_sanitizes(tmp_path):
    p = tmp_path / "logs" / "api_access.log"
    log = AccessLogger(str(p))
    log.log("key\nid", "GET", "/v1/models\r\nInjected: yes", 200)
    content = p.read_text()
    assert "\nInjected" not in content
    assert "key_id" in content or "key_" in content
    assert content.count("\n") == 1


def test_nonpositive_rate_limit_line_rejected(tmp_path):
    """ADVICE r1 low: a rate-limit field of 0/negative/garbage must reject
    the whole line (fail-closed, reference line validation) — not load an
    unlimited key."""
    from llama_gguf_inference_tpu.serving.auth import APIKeyValidator
    good = "sk-" + "g" * 24
    kf = tmp_path / "keys.txt"
    kf.write_text(
        f"zero:sk-{'a' * 24}:0\n"
        f"neg:sk-{'b' * 24}:-5\n"
        f"bad:sk-{'c' * 24}:abc\n"
        f"good:{good}:10\n"
    )
    v = APIKeyValidator(enabled=True, keys_file=str(kf))
    assert len(v._keys) == 1
    assert v._keys[good] == "good"
    assert v._rate_limits["good"] == 10
