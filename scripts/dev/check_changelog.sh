#!/usr/bin/env bash
# PRs touching the package must update CHANGELOG.md
# (reference scripts/dev/check_changelog.sh).
set -u
cd "$(dirname "$0")/../.."
BASE="${1:-origin/main}"
if ! git rev-parse -q --verify "$BASE" >/dev/null 2>&1; then
    echo "base $BASE not found; skipping"; exit 0
fi
changed=$(git diff --name-only "$BASE"...HEAD)
if echo "$changed" | grep -q "^llama_gguf_inference_tpu/"; then
    echo "$changed" | grep -q "^CHANGELOG.md$" \
        && echo "changelog: OK" \
        || { echo "package changed without a CHANGELOG.md entry"; exit 1; }
else
    echo "no package changes"
fi
