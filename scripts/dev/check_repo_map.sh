#!/usr/bin/env bash
# Verify the README "## Layout" repo map mentions every package directory
# and top-level area (reference scripts/dev/check_repo_map.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/../.."

fail=0

# every python package under llama_gguf_inference_tpu/ must appear in README
for d in llama_gguf_inference_tpu/*/; do
    name=$(basename "$d")
    [ "$name" = "__pycache__" ] && continue
    if ! grep -q "${name}/" README.md; then
        echo "MISSING from README Layout: llama_gguf_inference_tpu/${name}/"
        fail=1
    fi
done

# top-level areas
for name in tests docs scripts; do
    if ! grep -q "^${name}/" README.md && ! grep -q "${name}/ " README.md; then
        echo "MISSING from README Layout: ${name}/"
        fail=1
    fi
done

if [ "$fail" -ne 0 ]; then
    echo "repo map check FAILED — update README.md ## Layout"
    exit 1
fi
echo "repo map check OK"
