"""key_mgmt CLI tests (contract: reference scripts/key_mgmt.py, SURVEY §2.5)."""

import os
import stat

import pytest

from llama_gguf_inference_tpu.serving import key_mgmt
from llama_gguf_inference_tpu.serving.auth import APIKeyValidator


@pytest.fixture
def kf(tmp_path):
    return str(tmp_path / "api_keys.txt")


def run(args, capsys):
    rc = key_mgmt.main(args)
    out = capsys.readouterr()
    return rc, out.out, out.err


def test_generate_and_list(kf, capsys):
    rc, out, _ = run(["--keys-file", kf, "generate", "--key-id", "prod", "--quiet"], capsys)
    assert rc == 0
    key = out.strip()
    assert key.startswith("sk-") and len(key) >= 16
    # file perms 0600
    mode = stat.S_IMODE(os.stat(kf).st_mode)
    assert mode == 0o600
    # list never prints the key value
    rc, out, _ = run(["--keys-file", kf, "list"], capsys)
    assert rc == 0
    assert "prod" in out
    assert key not in out
    # generated key actually validates
    v = APIKeyValidator(kf, enabled=True)
    assert v.validate({"authorization": f"Bearer {key}"}).ok


def test_duplicate_rejected(kf, capsys):
    run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
    rc, _, err = run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
    assert rc == 1
    assert "already exists" in err


def test_invalid_key_id(kf, capsys):
    rc, _, err = run(["--keys-file", kf, "generate", "--key-id", "bad id!!"], capsys)
    assert rc == 1
    assert "invalid key id" in err


def test_remove(kf, capsys):
    run(["--keys-file", kf, "generate", "--key-id", "x", "--quiet"], capsys)
    rc, _, _ = run(["--keys-file", kf, "remove", "--key-id", "x", "--quiet"], capsys)
    assert rc == 0
    rc, out, _ = run(["--keys-file", kf, "list", "--quiet"], capsys)
    assert "x" not in out.split()
    rc, _, err = run(["--keys-file", kf, "remove", "--key-id", "x"], capsys)
    assert rc == 1


def test_rotate_preserves_metadata(kf, capsys):
    rc, out, _ = run(["--keys-file", kf, "generate", "--key-id", "r",
                      "--rate-limit", "7", "--expires", "30d", "--quiet"], capsys)
    old_key = out.strip()
    rc, out, _ = run(["--keys-file", kf, "rotate", "--key-id", "r", "--quiet"], capsys)
    new_key = out.strip()
    assert new_key != old_key
    line = open(kf).read().strip()
    parts = line.split(":")
    assert parts[0] == "r"
    assert parts[1] == new_key
    assert parts[2] == "7"            # rate limit preserved
    assert parts[3]                    # expiration preserved


def test_relative_expirations(kf, capsys):
    for spec in ("30d", "24h", "60m"):
        assert key_mgmt.parse_expiration(spec).endswith("Z")
    with pytest.raises(SystemExit):
        key_mgmt.parse_expiration("nonsense")


def test_atomic_write_no_partial(kf, capsys, tmp_path):
    run(["--keys-file", kf, "generate", "--key-id", "k1", "--quiet"], capsys)
    before = open(kf).read()
    # a failing rotate (missing id) must not alter the file
    rc, _, _ = run(["--keys-file", kf, "rotate", "--key-id", "nope"], capsys)
    assert rc == 1
    assert open(kf).read() == before
    # no stray temp files
    leftovers = [p for p in os.listdir(os.path.dirname(kf)) if p.startswith(".keys-")]
    assert leftovers == []
