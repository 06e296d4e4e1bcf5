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


# ---- grammar + behavior depth (reference test_key_mgmt.py coverage) --------

class TestGenerateDepth:
    def test_key_shape_and_entropy(self, kf, capsys):
        rc, k1, _ = run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
        rc2, k2, _ = run(["--keys-file", kf, "generate", "--key-id", "b", "--quiet"], capsys)
        k1, k2 = k1.strip(), k2.strip()
        assert rc == rc2 == 0 and k1 != k2
        for k in (k1, k2):
            assert k.startswith("sk-") and 16 <= len(k) <= 128
            # loadable by the validator (round-trip through the shared grammar)
        v = APIKeyValidator(kf, enabled=True)
        assert v.n_keys == 2
        assert v.validate({"authorization": f"Bearer {k1}"}).key_id == "a"

    def test_file_mode_0600(self, kf, capsys):
        run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
        assert stat.S_IMODE(os.stat(kf).st_mode) == 0o600

    def test_nonquiet_never_needed_for_value(self, kf, capsys):
        rc, out, _ = run(["--keys-file", kf, "generate", "--key-id", "a"], capsys)
        assert rc == 0 and "not shown again" in out

    def test_key_id_65_chars_rejected(self, kf, capsys):
        rc, _, err = run(["--keys-file", kf, "generate", "--key-id", "i" * 65, "--quiet"], capsys)
        assert rc == 1 and "invalid key id" in err

    def test_rate_limit_recorded(self, kf, capsys):
        run(["--keys-file", kf, "generate", "--key-id", "a", "--rate-limit", "7", "--quiet"], capsys)
        line = open(kf).read().strip()
        assert line.split(":")[2] == "7"

    def test_absolute_iso_expiration(self, kf, capsys):
        rc, _, _ = run(["--keys-file", kf, "generate", "--key-id", "a",
                        "--expires", "2030-06-01T12:00:00Z", "--quiet"], capsys)
        assert rc == 0
        assert open(kf).read().strip().endswith("2030-06-01T12:00:00Z")

    def test_invalid_expiration_exits(self, kf, capsys):
        with pytest.raises(SystemExit, match="invalid expiration"):
            run(["--keys-file", kf, "generate", "--key-id", "a",
                 "--expires", "soon", "--quiet"], capsys)

    def test_preserves_unrelated_lines(self, kf, capsys):
        with open(kf, "w") as f:
            f.write("# infra keys\n\nexisting:" + "e" * 16 + ":5\n")
        run(["--keys-file", kf, "generate", "--key-id", "new", "--quiet"], capsys)
        content = open(kf).read()
        assert content.startswith("# infra keys\n\nexisting:")
        assert content.count("\n") == 4


class TestListDepth:
    def test_masks_values(self, kf, capsys):
        _, key, _ = run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
        _, out, _ = run(["--keys-file", kf, "list"], capsys)
        assert key.strip() not in out
        assert key.strip()[:6] in out          # prefix shown for identification

    def test_quiet_ids_only(self, kf, capsys):
        run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
        run(["--keys-file", kf, "generate", "--key-id", "b", "--quiet"], capsys)
        _, out, _ = run(["--keys-file", kf, "list", "--quiet"], capsys)
        assert out.split() == ["a", "b"]

    def test_empty_file(self, kf, capsys):
        rc, out, _ = run(["--keys-file", kf, "list"], capsys)
        assert rc == 0 and "No keys" in out

    def test_metadata_columns(self, kf, capsys):
        run(["--keys-file", kf, "generate", "--key-id", "a", "--rate-limit", "9",
             "--expires", "2031-01-01", "--quiet"], capsys)
        _, out, _ = run(["--keys-file", kf, "list"], capsys)
        assert "9" in out and "2031-01-01" in out


class TestRemoveRotateDepth:
    def test_remove_missing_errors(self, kf, capsys):
        rc, _, err = run(["--keys-file", kf, "remove", "--key-id", "ghost"], capsys)
        assert rc == 1 and "not found" in err

    def test_rotate_missing_errors(self, kf, capsys):
        rc, _, err = run(["--keys-file", kf, "rotate", "--key-id", "ghost"], capsys)
        assert rc == 1 and "not found" in err

    def test_remove_only_target(self, kf, capsys):
        for kid in ("a", "b", "c"):
            run(["--keys-file", kf, "generate", "--key-id", kid, "--quiet"], capsys)
        run(["--keys-file", kf, "remove", "--key-id", "b"], capsys)
        _, out, _ = run(["--keys-file", kf, "list", "--quiet"], capsys)
        assert out.split() == ["a", "c"]

    def test_rotate_changes_value_keeps_position(self, kf, capsys):
        run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
        _, old_b, _ = run(["--keys-file", kf, "generate", "--key-id", "b",
                           "--rate-limit", "3", "--expires", "2031-01-01", "--quiet"], capsys)
        _, new_b, _ = run(["--keys-file", kf, "rotate", "--key-id", "b", "--quiet"], capsys)
        assert new_b.strip() != old_b.strip()
        lines = open(kf).read().splitlines()
        assert lines[1].startswith("b:") and lines[1].endswith(":3:2031-01-01")

    def test_rotate_override_expiration(self, kf, capsys):
        run(["--keys-file", kf, "generate", "--key-id", "a",
             "--expires", "2030-01-01", "--quiet"], capsys)
        run(["--keys-file", kf, "rotate", "--key-id", "a",
             "--expires", "2035-01-01", "--quiet"], capsys)
        assert open(kf).read().strip().endswith("2035-01-01")

    def test_rotated_key_valid_old_dead(self, kf, capsys):
        _, old, _ = run(["--keys-file", kf, "generate", "--key-id", "a", "--quiet"], capsys)
        _, new, _ = run(["--keys-file", kf, "rotate", "--key-id", "a", "--quiet"], capsys)
        v = APIKeyValidator(kf, enabled=True)
        assert v.validate({"authorization": new.strip()}).ok
        assert not v.validate({"authorization": old.strip()}).ok


class TestExpirationGrammar:
    @pytest.mark.parametrize("rel", ["30d", "24h", "60m", "1d", "999h"])
    def test_relative_forms(self, rel):
        iso = key_mgmt.parse_expiration(rel)
        ts = key_mgmt.datetime.fromisoformat(iso[:-1] + "+00:00")
        assert ts > key_mgmt.datetime.now(key_mgmt.timezone.utc)

    @pytest.mark.parametrize("bad", ["30x", "d30", "-5d", "1.5h", "", "soon"])
    def test_invalid_forms(self, bad):
        with pytest.raises(SystemExit):
            key_mgmt.parse_expiration(bad)

    def test_absolute_passthrough(self):
        assert key_mgmt.parse_expiration("2031-05-05") == "2031-05-05"


def test_build_parse_roundtrip():
    for rl, exp in [(None, None), (5, None), (None, "2030-01-01T00:00:00"),
                    (9, "2030-01-01T00:00:00")]:
        line = key_mgmt.build_key_line("id1", "k" * 20, rl, exp)
        kid, key, rl2, exp2 = key_mgmt.parse_key_line(line)
        assert (kid, key) == ("id1", "k" * 20)
        assert (rl2 is None and rl is None) or int(rl2) == rl
        assert exp2 == exp
