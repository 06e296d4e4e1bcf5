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


# ---- key-line grammar depth (reference test_auth.py class coverage) --------

K16 = "k" * 16
K128 = "k" * 128


class TestParseKeyLine:
    P = staticmethod(APIKeyValidator.parse_key_line)

    def test_minimal(self):
        assert self.P(f"a:{K16}") == ("a", K16, None, None)

    def test_whitespace_tolerated(self):
        assert self.P(f"  a : {K16} ") == ("a", K16, None, None)

    def test_key_length_bounds(self):
        assert self.P(f"a:{'k' * 15}") is None
        assert self.P(f"a:{K16}") is not None
        assert self.P(f"a:{K128}") is not None
        assert self.P(f"a:{'k' * 129}") is None

    def test_key_id_bounds(self):
        assert self.P(f"{'i' * 64}:{K16}") is not None
        assert self.P(f"{'i' * 65}:{K16}") is None
        assert self.P(f":{K16}") is None

    def test_key_charset(self):
        assert self.P(f"a:{'k' * 15}!") is None     # ! not in [A-Za-z0-9_-]
        assert self.P(f"a:sk-A_z9-{'k' * 10}") is not None

    def test_key_id_charset(self):
        assert self.P(f"bad id:{K16}") is None
        assert self.P(f"ok_id-9:{K16}") is not None

    def test_comments_and_blanks(self):
        assert self.P("") is None
        assert self.P("   ") is None
        assert self.P("# a:bbbbbbbbbbbbbbbb") is None

    def test_rate_limit_field(self):
        assert self.P(f"a:{K16}:5") == ("a", K16, 5, None)
        assert self.P(f"a:{K16}:0") is None          # fail-closed
        assert self.P(f"a:{K16}:-3") is None
        assert self.P(f"a:{K16}:ten") is None
        assert self.P(f"a:{K16}:1.5") is None

    def test_empty_rate_with_expiration(self):
        got = self.P(f"a:{K16}::2030-01-01")
        assert got is not None and got[2] is None and got[3] is not None

    def test_expiration_with_colons(self):
        got = self.P(f"a:{K16}:7:2030-12-31T23:59:59")
        assert got is not None and got[2] == 7
        assert got[3] == parse_expiration_ts("2030-12-31T23:59:59")

    def test_expiration_z_and_offset(self):
        z = self.P(f"a:{K16}::2030-01-01T00:00:00Z")
        off = self.P(f"a:{K16}::2030-01-01T02:00:00+02:00")
        assert z is not None and off is not None
        assert abs(z[3] - off[3]) < 1e-6              # same instant

    def test_unparseable_expiration_rejects_line(self):
        # fail-closed: never load a key that was MEANT to expire
        assert self.P(f"a:{K16}::not-a-date") is None
        assert self.P(f"a:{K16}::2030-13-45") is None
        assert self.P(f"a:{K16}:5:99999999999999") is None


class TestLoadSemantics:
    def test_duplicate_api_key_first_wins(self, tmp_path):
        p = tmp_path / "k.txt"
        p.write_text(f"first:{K16}\nsecond:{K16}\n")
        v = APIKeyValidator(str(p), enabled=True)
        assert v.n_keys == 1
        assert v.validate({"authorization": K16}).key_id == "first"

    def test_same_key_id_two_keys_share_window(self, tmp_path):
        k2 = "m" * 16
        p = tmp_path / "k.txt"
        p.write_text(f"shared:{K16}:2\nshared:{k2}:2\n")
        v = APIKeyValidator(str(p), enabled=True)
        assert v.validate({"authorization": K16}).ok
        assert v.validate({"authorization": k2}).ok
        # window keyed by key_id: third request under either key → 429
        r = v.validate({"authorization": K16})
        assert not r.ok and r.status == 429

    def test_unreadable_file_fail_closed(self, tmp_path):
        v = APIKeyValidator(str(tmp_path / "missing.txt"), enabled=True)
        assert v.n_keys == 0 and v.load_error
        r = v.validate({"authorization": K16})
        assert not r.ok and "misconfigured" in r.message

    def test_reload_path_rotation_via_env(self, tmp_path, monkeypatch):
        p1 = tmp_path / "a.txt"; p1.write_text(f"a:{K16}\n")
        p2 = tmp_path / "b.txt"; p2.write_text(f"b:{'m' * 16}\n")
        v = APIKeyValidator(str(p1), enabled=True)
        assert v.validate({"authorization": K16}).ok
        monkeypatch.setenv("AUTH_KEYS_FILE", str(p2))
        assert v.reload_keys() == 1
        assert not v.validate({"authorization": K16}).ok
        assert v.validate({"authorization": "m" * 16}).key_id == "b"

    def test_reload_to_empty_fail_closed(self, tmp_path):
        p = tmp_path / "k.txt"
        p.write_text(f"a:{K16}\n")
        v = APIKeyValidator(str(p), enabled=True)
        p.write_text("# rotated away\n")
        assert v.reload_keys(str(p)) == 0
        assert not v.validate({"authorization": K16}).ok


class TestExtractKey:
    E = staticmethod(APIKeyValidator.extract_key)

    def test_prefix_case_insensitive(self):
        assert self.E({"authorization": f"BEARER {K16}"}) == (K16, None)
        assert self.E({"authorization": f"bearer {K16}"}) == (K16, None)

    def test_bare_bearer_is_empty(self):
        key, err = self.E({"authorization": "Bearer"})
        assert key is None and err == "Empty Authorization header"

    def test_inner_whitespace_stripped(self):
        assert self.E({"authorization": f"Bearer   {K16}  "}) == (K16, None)

    def test_no_prefix(self):
        assert self.E({"authorization": K16}) == (K16, None)


class TestValidateDepth:
    def test_precedence_format_before_lookup(self, tmp_path):
        # invalid format must be rejected before lookup (cheap filter,
        # constant-time scan only over well-formed candidates)
        p = tmp_path / "k.txt"; p.write_text(f"a:{K16}\n")
        v = APIKeyValidator(str(p), enabled=True)
        r = v.validate({"authorization": "Bearer !" + "k" * 20})
        assert r.message == "Invalid API key format"

    def test_expired_precedes_rate_limit(self, tmp_path):
        p = tmp_path / "k.txt"
        p.write_text(f"old:{K16}:1:2020-01-01\n")
        v = APIKeyValidator(str(p), enabled=True)
        r = v.validate({"authorization": K16})
        assert r.status == 401 and r.message == "API key expired"

    def test_default_rate_limit_zero_unlimited(self, tmp_path):
        p = tmp_path / "k.txt"; p.write_text(f"a:{K16}\n")
        v = APIKeyValidator(str(p), enabled=True, default_rate_limit=0)
        for _ in range(50):
            assert v.validate({"authorization": K16}).ok

    def test_per_key_override_beats_default(self, tmp_path):
        p = tmp_path / "k.txt"
        p.write_text(f"tight:{K16}:1\nroomy:{'m' * 16}\n")
        v = APIKeyValidator(str(p), enabled=True, default_rate_limit=100)
        assert v.validate({"authorization": K16}).ok
        assert v.validate({"authorization": K16}).status == 429
        for _ in range(10):
            assert v.validate({"authorization": "m" * 16}).ok

    def test_429_carries_key_id(self, tmp_path):
        p = tmp_path / "k.txt"; p.write_text(f"a:{K16}:1\n")
        v = APIKeyValidator(str(p), enabled=True)
        v.validate({"authorization": K16})
        r = v.validate({"authorization": K16})
        assert r.status == 429 and r.key_id == "a"

    def test_window_gc_drops_stale_keys(self, tmp_path):
        p = tmp_path / "k.txt"; p.write_text(f"a:{K16}:5\n")
        v = APIKeyValidator(str(p), enabled=True)
        v.validate({"authorization": K16})
        assert v.get_metrics()["active_rate_windows"] == 1
        # force the lazy GC past its interval with an aged window
        v._windows["a"] = [time.monotonic() - 120.0]
        v._last_gc = time.monotonic() - 400.0
        v._maybe_gc(time.monotonic())
        assert v.get_metrics()["active_rate_windows"] == 0


class TestAccessLoggerDepth:
    def test_disabled_when_no_path(self):
        AccessLogger(None).log("a", "GET", "/x", 200)   # no-op, no error

    def test_field_truncation(self, tmp_path):
        p = tmp_path / "log" / "a.log"
        lg = AccessLogger(str(p))
        lg.log("i" * 300, "M" * 50, "/p" * 400, 200)
        line = p.read_text().strip()
        _, kid, mp, status = [f.strip() for f in line.split(" | ")]
        assert len(kid) == 64 and status == "200"
        meth, path = mp.split(" ", 1)
        assert len(meth) == 16 and len(path) == 256

    def test_injection_sanitized(self, tmp_path):
        p = tmp_path / "a.log"
        lg = AccessLogger(str(p))
        lg.log("evil\r\nFAKE", "GET", "/x\x00\x1b[31m", 401)
        content = p.read_text()
        assert content.count("\n") == 1
        assert "\r" not in content and "\x00" not in content and "\x1b" not in content
