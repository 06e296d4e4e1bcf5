#!/usr/bin/env bash
# Every env var read by the code must be documented in .env.example
# (reference scripts/dev/check_env_completeness.sh).
set -u
cd "$(dirname "$0")/../.."
missing=0
vars=$(grep -rhoE 'os\.environ(\.get)?\(["'"'"'][A-Z][A-Z0-9_]+' \
    llama_gguf_inference_tpu | grep -oE '[A-Z][A-Z0-9_]+$' | sort -u)
for v in $vars; do
    case "$v" in
        # internal/jax/infra vars exempt from the user-facing contract
        JAX_*|XLA_*|PALLAS_*|TPU_*|PYTHON*|PATH|HOME) continue ;;
    esac
    grep -q "$v" .env.example || { echo "UNDOCUMENTED: $v"; missing=1; }
done
[ "$missing" = 0 ] && echo "env completeness: OK"
exit $missing
