"""Launcher integration test — the reference CI's MOCK_BACKEND container tier
(reference .github/workflows/ci.yml:185-228): boot the full 3-process stack
with no model, assert /ping 200, unauthenticated /v1 -> 401, authenticated ->
200, health sidecar 200 on every path, then clean SIGTERM shutdown."""

import os
import signal
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

from llama_gguf_inference_tpu.serving.key_mgmt import main as key_mgmt_main
from llama_gguf_inference_tpu.launch.start import (
    detect_data_dir, is_truthy, resolve_model,
)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def get(url, key=None, timeout=2.0, retry_for=0.0):
    """GET returning a status code.  ``retry_for`` > 0 retries connection-level
    failures (URLError/refused) for that many seconds — the 3 stack processes
    come up independently, so each port's first contact must poll, not assert
    (a raw URLError here was the one flaky test of round 1)."""
    req = urllib.request.Request(url)
    if key:
        req.add_header("Authorization", f"Bearer {key}")
    deadline = time.monotonic() + retry_for
    while True:
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code
        except OSError:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.2)


def test_is_truthy():
    assert is_truthy("true") and is_truthy("1") and is_truthy("YES")
    assert not is_truthy("false") and not is_truthy("") and not is_truthy(None)


def test_resolve_model_precedence(tmp_path, monkeypatch):
    m = tmp_path / "a.gguf"
    m.write_bytes(b"x")
    monkeypatch.setenv("MODEL_PATH", str(m))
    monkeypatch.setenv("MODEL_NAME", "other.gguf")
    assert resolve_model(str(tmp_path)) == str(m)
    monkeypatch.delenv("MODEL_PATH")
    monkeypatch.setenv("MODELS_DIR", str(tmp_path))
    monkeypatch.setenv("MODEL_NAME", "a.gguf")
    assert resolve_model(str(tmp_path)) == str(m)
    monkeypatch.setenv("MODEL_NAME", "missing.gguf")
    assert resolve_model(str(tmp_path)) is None


@pytest.mark.slow
def test_mock_stack_boot(tmp_path):
    gw_port, health_port, backend_port = free_port(), free_port(), free_port()
    keys_file = tmp_path / "api_keys.txt"
    rc = key_mgmt_main(["--keys-file", str(keys_file), "generate",
                        "--key-id", "ci", "--quiet"])
    assert rc == 0
    # re-read the generated key
    api_key = keys_file.read_text().strip().split(":")[1]

    env = dict(os.environ)
    env.update({
        "MOCK_BACKEND": "true",
        "DATA_DIR": str(tmp_path),
        "GATEWAY_PORT": str(gw_port),
        "PORT_HEALTH": str(health_port),
        "PORT_BACKEND": str(backend_port),
        "AUTH_KEYS_FILE": str(keys_file),
        "BACKEND_KEY_DIR": str(tmp_path),
        "JAX_PLATFORMS": "cpu",
    })
    log_path = tmp_path / "stack.log"
    log_f = open(log_path, "wb")
    proc = subprocess.Popen(
        [sys.executable, "-m", "llama_gguf_inference_tpu.launch.start"],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=log_f, stderr=subprocess.STDOUT,
    )
    try:
        # wait for gateway /ping (generous: the suite may be paging/compiling
        # in other processes and interpreter start alone can take seconds)
        deadline = time.monotonic() + 120
        ok = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                break   # supervisor died — fail below with its output
            try:
                if get(f"http://127.0.0.1:{gw_port}/ping") == 200:
                    ok = True
                    break
            except OSError:
                pass
            time.sleep(0.3)
        if not ok:
            log_f.flush()
            tail = log_path.read_bytes()[-4000:].decode("utf-8", "replace")
            raise AssertionError(
                f"gateway /ping never came up (supervisor rc={proc.poll()});"
                f" stack log tail:\n{tail}")

        assert get(f"http://127.0.0.1:{gw_port}/v1/models", retry_for=10) == 401
        assert get(f"http://127.0.0.1:{gw_port}/v1/models", api_key,
                   retry_for=10) == 200
        assert get(f"http://127.0.0.1:{health_port}/", retry_for=30) == 200
        assert get(f"http://127.0.0.1:{health_port}/anything") == 200
        assert get(f"http://127.0.0.1:{gw_port}/health", retry_for=10) == 200

        # graceful shutdown on SIGTERM
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=15)
        # key file shredded
        leftovers = list((tmp_path / "llama-keys").glob("*.key")) \
            if (tmp_path / "llama-keys").exists() else []
        assert leftovers == []
    finally:
        if proc.poll() is None:
            # graceful first so the supervisor can reap its children
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=10)
        log_f.close()


def test_verify_localhost_bind_loopback():
    from llama_gguf_inference_tpu.launch.start import verify_localhost_bind
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    port = s.getsockname()[1]
    try:
        assert verify_localhost_bind(port) is True
    finally:
        s.close()


def test_verify_localhost_bind_wildcard():
    from llama_gguf_inference_tpu.launch.start import verify_localhost_bind
    s = socket.socket()
    s.bind(("0.0.0.0", 0))
    s.listen(1)
    port = s.getsockname()[1]
    try:
        assert verify_localhost_bind(port) is False
    finally:
        s.close()


def test_verify_localhost_bind_absent_port():
    from llama_gguf_inference_tpu.launch.start import verify_localhost_bind
    # a port with no listener: nothing found -> None (unverifiable)
    assert verify_localhost_bind(free_port()) is None


def test_scan_auth_failure():
    from llama_gguf_inference_tpu.launch.start import scan_auth_failure
    assert scan_auth_failure('GET /v1/models -> 401')
    assert scan_auth_failure('Unauthorized request from 10.0.0.9')
    assert not scan_auth_failure('status=200 path=/v1/models')
    assert not scan_auth_failure('committed 4012 bytes')  # word boundary
