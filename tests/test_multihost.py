"""Multi-host serving loop (VERDICT r1 missing #2 / SURVEY §5.8).

Spawns real jax.distributed processes on CPU: host 0 owns the sockets and
leads the lockstep engine; workers replay the broadcast command stream.
Tokens must be identical to a single-process run with the same tensor
partitioning (tp = 2 in both cases, so reduction orders match).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from llama_gguf_inference_tpu.gguf.constants import GGMLType
from llama_gguf_inference_tpu.utils.testing import write_tiny_llama

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "mh_driver.py")


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_driver(pid, nprocs, port, model, mode, devices, variant="base"):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices}",
        "LGT_LAYOUT_CACHE": "0",
        "PYTHONPATH": REPO,
    })
    return subprocess.Popen(
        [sys.executable, DRIVER, str(pid), str(nprocs), str(port), model,
         mode, variant],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def parse_tokens(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("TOKENS "):
            return json.loads(line[len("TOKENS "):])
    raise AssertionError(f"no TOKENS line in output:\n{stdout}")


@pytest.mark.slow
def test_two_process_lockstep_matches_single(tmp_path):
    model = str(tmp_path / "m.gguf")
    write_tiny_llama(model, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0)

    # reference: one process, 2 local devices, tp=2
    single = run_driver(0, 1, "0", model, "single", devices=2)
    out, err = single.communicate(timeout=600)
    assert single.returncode == 0, f"single-proc run failed:\n{err[-3000:]}"
    want = parse_tokens(out)

    # multi: two processes, 1 device each, tp=2 across hosts
    port = free_port()
    follower = run_driver(1, 2, port, model, "multi", devices=1)
    leader = run_driver(0, 2, port, model, "multi", devices=1)
    l_out, l_err = leader.communicate(timeout=600)
    f_out, f_err = follower.communicate(timeout=60)
    assert leader.returncode == 0, f"leader failed:\n{l_err[-3000:]}"
    assert follower.returncode == 0, f"follower failed:\n{f_err[-3000:]}"
    got = parse_tokens(l_out)

    assert got["tokens"] == want["tokens"], \
        f"multi-host tokens diverged:\n{got['tokens']}\nvs\n{want['tokens']}"
    assert got["http"] == 200   # real HTTP served on host 0


@pytest.mark.slow
def test_two_process_lockstep_paged_kv(tmp_path):
    """Paged KV under multi-host (VERDICT r4 #5): the leader's page table
    rides the command broadcast, so followers mirror reservations and the
    token stream matches a single-process paged run — including the
    grammar + logit_bias requests the driver mixes in."""
    model = str(tmp_path / "m.gguf")
    write_tiny_llama(model, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                     ffn_dim=96, quant=GGMLType.Q4_0)

    single = run_driver(0, 1, "0", model, "single", devices=2,
                        variant="paged")
    out, err = single.communicate(timeout=600)
    assert single.returncode == 0, f"single-proc paged run failed:\n{err[-3000:]}"
    want = parse_tokens(out)

    port = free_port()
    follower = run_driver(1, 2, port, model, "multi", devices=1,
                          variant="paged")
    leader = run_driver(0, 2, port, model, "multi", devices=1,
                        variant="paged")
    l_out, l_err = leader.communicate(timeout=600)
    f_out, f_err = follower.communicate(timeout=60)
    assert leader.returncode == 0, f"leader failed:\n{l_err[-3000:]}"
    assert follower.returncode == 0, f"follower failed:\n{f_err[-3000:]}"
    got = parse_tokens(l_out)

    assert got["tokens"] == want["tokens"], \
        f"multi-host paged tokens diverged:\n{got['tokens']}\nvs\n{want['tokens']}"
    assert got["http"] == 200


@pytest.mark.slow
def test_four_process_lockstep_matches_single(tmp_path):
    """Wider fleet: 4 jax.distributed processes, tp=4 across hosts."""
    model = str(tmp_path / "m.gguf")
    write_tiny_llama(model, dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
                     ffn_dim=128, quant=GGMLType.Q4_0)

    single = run_driver(0, 1, "0", model, "single", devices=4)
    out, err = single.communicate(timeout=600)
    assert single.returncode == 0, f"single-proc run failed:\n{err[-3000:]}"
    want = parse_tokens(out)

    port = free_port()
    followers = [run_driver(i, 4, port, model, "multi", devices=1)
                 for i in range(1, 4)]
    leader = run_driver(0, 4, port, model, "multi", devices=1)
    l_out, l_err = leader.communicate(timeout=600)
    assert leader.returncode == 0, f"leader failed:\n{l_err[-3000:]}"
    for i, f in enumerate(followers):
        f_out, f_err = f.communicate(timeout=60)
        assert f.returncode == 0, f"follower {i+1} failed:\n{f_err[-3000:]}"
    got = parse_tokens(l_out)

    assert got["tokens"] == want["tokens"], \
        f"4-host tokens diverged:\n{got['tokens']}\nvs\n{want['tokens']}"
    assert got["http"] == 200
