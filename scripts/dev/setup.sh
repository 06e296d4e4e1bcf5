#!/usr/bin/env bash
# Dev environment bootstrap (reference scripts/dev/setup.sh equivalent).
#
# Installs dev dependencies, builds the native repacker, wires pre-commit
# hooks, and runs a quick smoke slice of the test suite.
set -euo pipefail
cd "$(dirname "$0")/../.."

echo "== python =="
python3 --version

echo "== dependencies =="
# runtime deps are jax + numpy + jinja2; dev adds linters/test tooling.
# in hermetic environments (no egress) this is a no-op: everything is baked.
if python3 -m pip --version >/dev/null 2>&1 && [ -z "${NO_PIP:-}" ]; then
    python3 -m pip install -q -e ".[dev]" 2>/dev/null \
        || echo "(pip install skipped — hermetic environment)"
fi

echo "== native repacker =="
if command -v g++ >/dev/null 2>&1; then
    python3 -c "from llama_gguf_inference_tpu.native import ensure_built; ensure_built()" \
        2>/dev/null || make -C llama_gguf_inference_tpu/native 2>/dev/null \
        || echo "(native build skipped — numpy fallback active)"
else
    echo "(no g++ — numpy repack fallback active)"
fi

echo "== pre-commit hooks =="
if command -v pre-commit >/dev/null 2>&1; then
    pre-commit install
else
    # minimal fallback: changelog + env completeness + repo map checks
    cat > .git/hooks/pre-commit <<'HOOK'
#!/usr/bin/env bash
set -e
scripts/dev/check_changelog.sh || true
scripts/dev/check_env_completeness.sh
scripts/dev/check_repo_map.sh
HOOK
    chmod +x .git/hooks/pre-commit
    echo "installed fallback .git/hooks/pre-commit (pre-commit not found)"
fi

echo "== smoke tests =="
python3 -m pytest tests/test_quant.py tests/test_launch.py -q -k "not mock_stack"

echo "setup complete"
