"""Key-management + benchmark CLI depth tests (VERDICT r1 item 5; reference
test_key_mgmt.py / test_benchmark.py checklists): key-line grammar, relative
expirations, atomic writes, list/remove/rotate semantics, nearest-rank
percentiles, SSE token parsing."""

import os
import re
import stat
from datetime import datetime, timedelta, timezone

import pytest

from llama_gguf_inference_tpu.serving import key_mgmt as km
from llama_gguf_inference_tpu.serving.benchmark import (
    compute_stats, parse_sse_tokens, percentile,
)


# ---------------------------------------------------------------------------
# key generation + line grammar
# ---------------------------------------------------------------------------

class TestKeyGrammar:
    def test_generate_key_format(self):
        k = km.generate_key()
        assert k.startswith("sk-")
        assert re.fullmatch(r"sk-[A-Za-z0-9_-]{40,50}", k)
        assert km.generate_key() != k   # CSPRNG: no repeats

    def test_build_minimal_line(self):
        assert km.build_key_line("id1", "sk-abc", None, None) == "id1:sk-abc"

    def test_build_with_rate_limit(self):
        assert km.build_key_line("id1", "sk-abc", 50, None) == "id1:sk-abc:50"

    def test_build_with_expiration_only(self):
        # empty rate-limit slot preserved so the expiration lands in field 4
        line = km.build_key_line("id1", "sk-abc", None, "2030-01-01T00:00:00Z")
        assert line == "id1:sk-abc::2030-01-01T00:00:00Z"

    def test_build_full_line(self):
        line = km.build_key_line("id1", "sk-abc", 10, "2030-01-01T00:00:00Z")
        assert line == "id1:sk-abc:10:2030-01-01T00:00:00Z"

    def test_roundtrip_parse(self):
        for rl, exp in [(None, None), (10, None), (None, "2030-01-01T00:00:00Z"),
                        (5, "2030-01-01T00:00:00Z")]:
            line = km.build_key_line("kid", "sk-xyz", rl, exp)
            kid, key, prl, pexp = km.parse_key_line(line)
            assert (kid, key) == ("kid", "sk-xyz")
            assert (prl is None) == (rl is None)
            assert pexp == exp

    def test_parse_skips_comments_and_blanks(self):
        assert km.parse_key_line("# comment") is None
        assert km.parse_key_line("   ") is None
        assert km.parse_key_line("") is None

    def test_parse_rejects_single_field(self):
        assert km.parse_key_line("justonefield") is None

    def test_parse_expiration_with_colons(self):
        # ISO timestamps contain colons; everything after field 3 rejoins
        kid, key, rl, exp = km.parse_key_line(
            "a:sk-k:5:2030-01-01T10:20:30Z")
        assert exp == "2030-01-01T10:20:30Z"


class TestParseExpiration:
    @pytest.mark.parametrize("spec,delta", [
        ("30d", timedelta(days=30)),
        ("24h", timedelta(hours=24)),
        ("60m", timedelta(minutes=60)),
        ("1d", timedelta(days=1)),
    ])
    def test_relative(self, spec, delta):
        out = km.parse_expiration(spec)
        got = datetime.strptime(out, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc)
        expect = datetime.now(timezone.utc) + delta
        assert abs((got - expect).total_seconds()) < 5

    def test_absolute_passthrough(self):
        assert km.parse_expiration("2031-05-06T07:08:09Z") == "2031-05-06T07:08:09Z"

    @pytest.mark.parametrize("bad", ["soon", "30x", "d30", "2031-13-45", ""])
    def test_invalid_exits(self, bad):
        with pytest.raises(SystemExit):
            km.parse_expiration(bad)


# ---------------------------------------------------------------------------
# atomic write + file hygiene
# ---------------------------------------------------------------------------

class TestAtomicWrite:
    def test_writes_0600(self, tmp_path):
        p = tmp_path / "keys.txt"
        km.atomic_write(str(p), ["a:sk-1"])
        mode = stat.S_IMODE(os.stat(p).st_mode)
        assert mode == 0o600
        assert p.read_text() == "a:sk-1\n"

    def test_replaces_existing(self, tmp_path):
        p = tmp_path / "keys.txt"
        p.write_text("old\n")
        km.atomic_write(str(p), ["new:sk-2"])
        assert p.read_text() == "new:sk-2\n"

    def test_empty_list_writes_empty_file(self, tmp_path):
        p = tmp_path / "keys.txt"
        km.atomic_write(str(p), [])
        assert p.read_text() == ""

    def test_no_temp_litter(self, tmp_path):
        p = tmp_path / "keys.txt"
        km.atomic_write(str(p), ["a:sk-1"])
        leftovers = [f for f in os.listdir(tmp_path) if f.startswith(".keys-")]
        assert leftovers == []


# ---------------------------------------------------------------------------
# CLI commands end-to-end (argv level, like the reference's tests)
# ---------------------------------------------------------------------------

class TestCliCommands:
    def run(self, tmp_path, *argv):
        return km.main(["--keys-file", str(tmp_path / "k.txt"), *argv])

    def test_generate_then_list_hides_value(self, tmp_path, capsys):
        assert self.run(tmp_path, "generate", "--key-id", "alpha") == 0
        stored = (tmp_path / "k.txt").read_text()
        key_value = stored.strip().split(":")[1]
        capsys.readouterr()
        assert self.run(tmp_path, "list") == 0
        out = capsys.readouterr().out
        assert "alpha" in out
        assert key_value not in out     # list never prints stored keys

    def test_generate_duplicate_id_fails(self, tmp_path):
        assert self.run(tmp_path, "generate", "--key-id", "a", "--quiet") == 0
        assert self.run(tmp_path, "generate", "--key-id", "a", "--quiet") != 0

    def test_generate_invalid_id_fails(self, tmp_path):
        assert self.run(tmp_path, "generate", "--key-id", "bad id!") != 0
        assert self.run(tmp_path, "generate", "--key-id", "x" * 65) != 0

    def test_quiet_prints_only_key(self, tmp_path, capsys):
        assert self.run(tmp_path, "generate", "--key-id", "q", "--quiet") == 0
        out = capsys.readouterr().out.strip()
        assert re.fullmatch(r"sk-[A-Za-z0-9_-]+", out)

    def test_remove(self, tmp_path):
        self.run(tmp_path, "generate", "--key-id", "a", "--quiet")
        self.run(tmp_path, "generate", "--key-id", "b", "--quiet")
        assert self.run(tmp_path, "remove", "--key-id", "a") == 0
        text = (tmp_path / "k.txt").read_text()
        assert "a:" not in text and "b:" in text

    def test_remove_missing_fails(self, tmp_path):
        self.run(tmp_path, "generate", "--key-id", "a", "--quiet")
        assert self.run(tmp_path, "remove", "--key-id", "nope") != 0

    def test_rotate_changes_key_preserves_metadata(self, tmp_path, capsys):
        self.run(tmp_path, "generate", "--key-id", "r", "--rate-limit", "42",
                 "--expires", "2030-01-01T00:00:00Z", "--quiet")
        before = km.parse_key_line((tmp_path / "k.txt").read_text().strip())
        capsys.readouterr()
        assert self.run(tmp_path, "rotate", "--key-id", "r", "--quiet") == 0
        after = km.parse_key_line((tmp_path / "k.txt").read_text().strip())
        assert after[0] == "r"
        assert after[1] != before[1]                # new key value
        assert after[2] == before[2] == "42"        # rate limit preserved
        assert after[3] == before[3]                # expiration preserved

    def test_rotate_missing_fails(self, tmp_path):
        assert self.run(tmp_path, "rotate", "--key-id", "ghost") != 0

    def test_generate_with_rate_limit_and_expiry(self, tmp_path):
        assert self.run(tmp_path, "generate", "--key-id", "full",
                        "--rate-limit", "7", "--expires", "30d",
                        "--quiet") == 0
        kid, key, rl, exp = km.parse_key_line(
            (tmp_path / "k.txt").read_text().strip())
        assert rl == "7" and exp.endswith("Z")

    def test_comments_preserved_across_operations(self, tmp_path):
        (tmp_path / "k.txt").write_text("# production keys\nold:sk-oldkey123456\n")
        self.run(tmp_path, "generate", "--key-id", "new", "--quiet")
        text = (tmp_path / "k.txt").read_text()
        assert text.startswith("# production keys\n")
        assert "old:sk-oldkey123456" in text


# ---------------------------------------------------------------------------
# benchmark statistics (reference TestPercentile / TestComputeStats)
# ---------------------------------------------------------------------------

class TestBenchmarkStats:
    def test_percentile_nearest_rank(self):
        vals = [float(v) for v in range(1, 101)]    # 1..100
        assert percentile(vals, 50) == 50.0
        assert percentile(vals, 95) == 95.0
        assert percentile(vals, 99) == 99.0
        assert percentile(vals, 100) == 100.0

    def test_percentile_small_samples(self):
        assert percentile([5.0], 99) == 5.0
        assert percentile([1.0, 2.0], 50) == 1.0
        assert percentile([], 50) == 0.0

    def test_percentile_unsorted_input(self):
        assert percentile([3.0, 1.0, 2.0], 50) == 2.0

    def test_compute_stats_fields(self):
        s = compute_stats([1.0, 2.0, 3.0, 4.0])
        assert s["count"] == 4
        assert s["mean"] == 2.5
        assert s["min"] == 1.0 and s["max"] == 4.0
        assert s["p50"] == 2.0

    def test_compute_stats_empty(self):
        s = compute_stats([])
        assert s == {"count": 0, "mean": 0.0, "min": 0.0, "max": 0.0,
                     "p50": 0.0, "p95": 0.0, "p99": 0.0}


class TestSseParsing:
    def test_extracts_delta_content(self):
        buf = ('data: {"choices":[{"delta":{"content":"Hel"}}]}\n'
               'data: {"choices":[{"delta":{"content":"lo"}}]}\n')
        toks, rem = parse_sse_tokens(buf)
        assert toks == ["Hel", "lo"]
        assert rem == ""

    def test_partial_line_kept_as_remainder(self):
        buf = ('data: {"choices":[{"delta":{"content":"a"}}]}\n'
               'data: {"choices":[{"del')
        toks, rem = parse_sse_tokens(buf)
        assert toks == ["a"]
        assert rem == 'data: {"choices":[{"del'

    def test_done_marker_and_noise_ignored(self):
        buf = ("data: [DONE]\n"
               ": comment\n"
               "event: ping\n"
               "data: not-json\n"
               'data: {"choices":[]}\n'
               'data: {"choices":[{"delta":{}}]}\n')
        toks, rem = parse_sse_tokens(buf)
        assert toks == [] and rem == ""

    def test_empty_buffer(self):
        assert parse_sse_tokens("") == ([], "")
