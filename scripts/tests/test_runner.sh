#!/usr/bin/env bash
# Orchestrate the shell black-box tiers (reference scripts/tests/test_runner.sh).
# Boots a mock-backend stack unless GATEWAY_URL points at a live one.
set -u
cd "$(dirname "$0")"
REPO_ROOT=$(cd ../.. && pwd)
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"

GATEWAY_PORT="${GATEWAY_PORT:-18100}"
HEALTH_PORT="${PORT_HEALTH:-18101}"
BACKEND_PORT="${PORT_BACKEND:-18102}"
STARTED=""
TMPDIR_T=$(mktemp -d)
trap 'if [ -n "$STARTED" ]; then kill "$STARTED" 2>/dev/null; wait "$STARTED" 2>/dev/null; fi; rm -rf "$TMPDIR_T"' EXIT

if [ -z "${GATEWAY_URL:-}" ]; then
    echo "== booting mock stack on :$GATEWAY_PORT =="
    python3 -m llama_gguf_inference_tpu.serving.key_mgmt \
        --keys-file "$TMPDIR_T/api_keys.txt" generate --key-id shelltest --quiet \
        > "$TMPDIR_T/key.txt"
    API_KEY=$(cat "$TMPDIR_T/key.txt")
    export API_KEY
    export KEYS_FILE="$TMPDIR_T/api_keys.txt"
    MOCK_BACKEND=true DATA_DIR="$TMPDIR_T" BACKEND_KEY_DIR="$TMPDIR_T" CORS_ORIGINS="*" \
        GATEWAY_PORT=$GATEWAY_PORT PORT_HEALTH=$HEALTH_PORT PORT_BACKEND=$BACKEND_PORT \
        AUTH_KEYS_FILE="$TMPDIR_T/api_keys.txt" JAX_PLATFORMS=cpu \
        python3 -m llama_gguf_inference_tpu.launch.start > "$TMPDIR_T/stack.log" 2>&1 &
    STARTED=$!
    export GATEWAY_URL="http://127.0.0.1:$GATEWAY_PORT"
    export CORS_ENABLED=1
    export HEALTH_URL="http://127.0.0.1:$HEALTH_PORT"
    for _ in $(seq 1 60); do
        curl -s -o /dev/null "$GATEWAY_URL/ping" && break
        sleep 0.5
    done
fi

rc=0
for t in test_health.sh test_auth.sh test_integration.sh test_queue.sh; do
    echo; echo "==== $t ===="
    bash "$t" || rc=1
done

if [ "${DOCKER_TEST:-}" = "true" ]; then
    echo; echo "==== docker integration (DOCKER_TEST=true) ===="
    bash test_docker_integration.sh || rc=1
fi

exit $rc
