#!/usr/bin/env bash
# Docker black-box integration test (reference scripts/tests/
# test_docker_integration.sh, SURVEY.md §4.3): build the CPU image, boot it
# in mock and real-model modes, exercise the API contract through published
# ports, verify volumes/env handling, and assert clean shutdown.
#
# Requires a docker daemon; CI gates this on DOCKER_TEST=true
# (test_runner.sh does the same for the local tiers).
set -u
cd "$(dirname "$0")/../.."

PASS=0
FAIL=0
NAME="lgt-inttest-$$"
PORT=28000
HPORT=28001
VOL=$(mktemp -d)

say()  { printf '%s\n' "$*"; }
ok()   { PASS=$((PASS+1)); say "  PASS: $1"; }
bad()  { FAIL=$((FAIL+1)); say "  FAIL: $1"; }
check() { # check <desc> <expected> <actual>
    if [ "$2" = "$3" ]; then ok "$1"; else bad "$1 (want $2 got $3)"; fi
}

cleanup() {
    docker rm -f "$NAME" >/dev/null 2>&1 || true
    rm -rf "$VOL"
}
trap cleanup EXIT

if ! command -v docker >/dev/null 2>&1 || ! docker info >/dev/null 2>&1; then
    say "SKIP: docker unavailable"
    exit 0
fi

say "== build =="
if docker build -q -f Dockerfile.cpu -t lgt:inttest . >/dev/null; then
    ok "image builds"
else
    bad "image build"
    exit 1
fi

say "== image hygiene =="
user=$(docker run --rm lgt:inttest whoami)
check "runs as non-root" "inference" "$user"
ver=$(docker run --rm lgt:inttest cat /app/VERSION | wc -l)
check "VERSION file present" "1" "$ver"

say "== mock-backend boot =="
mkdir -p "$VOL/models" "$VOL/logs"
docker run -d --name "$NAME" \
    -p $PORT:8000 -p $HPORT:8001 \
    -v "$VOL":/data \
    -e MOCK_BACKEND=true -e JAX_PLATFORMS=cpu \
    lgt:inttest >/dev/null

ready=""
for _ in $(seq 1 45); do
    if curl -fs "http://127.0.0.1:$PORT/ping" >/dev/null 2>&1; then
        ready=1; break
    fi
    sleep 1
done
if [ -n "$ready" ]; then ok "/ping 200 within 45s"; else
    bad "gateway never ready"; docker logs "$NAME" | tail -30; exit 1; fi

code=$(curl -s -o /dev/null -w "%{http_code}" \
    "http://127.0.0.1:$PORT/v1/chat/completions" -d '{}')
check "unauthenticated /v1 -> 401" "401" "$code"

code=$(curl -s -o /dev/null -w "%{http_code}" "http://127.0.0.1:$HPORT/any/path")
check "health sidecar 200 on any path" "200" "$code"

say "== key management through the container =="
KEY=$(docker exec "$NAME" python -m llama_gguf_inference_tpu.serving.key_mgmt \
    --keys-file /data/api_keys.txt generate --key-id docker --quiet)
docker kill -s HUP "$NAME" >/dev/null   # hot reload
sleep 1
code=$(curl -s -o /dev/null -w "%{http_code}" \
    -H "Authorization: Bearer $KEY" "http://127.0.0.1:$PORT/v1/models")
case "$code" in
    200|502) ok "authenticated /v1/models -> $code (200 or 502 acceptable in mock)";;
    *) bad "authenticated /v1/models (got $code)";;
esac

say "== volume: logs land on the host mount =="
if [ -n "$(find "$VOL/logs" -type f 2>/dev/null)" ] \
   || docker exec "$NAME" sh -c 'ls /data/logs | grep -q .'; then
    ok "logs written under /data"
else
    bad "no logs under /data"
fi
if [ -f "$VOL/api_keys.txt" ]; then ok "key file on the host volume"; else
    bad "key file not on host volume"; fi

say "== metrics =="
body=$(curl -s "http://127.0.0.1:$PORT/metrics")
if printf '%s' "$body" | python3 -c "import json,sys; json.load(sys.stdin)" 2>/dev/null; then
    ok "/metrics valid JSON"
else
    bad "/metrics not JSON: $body"
fi
prom=$(curl -s -H "Accept: text/plain" "http://127.0.0.1:$PORT/metrics" | head -1)
case "$prom" in "# HELP"*) ok "prometheus exposition";; *) bad "prometheus exposition ($prom)";; esac

say "== graceful shutdown =="
docker stop -t 20 "$NAME" >/dev/null
rc=$(docker inspect -f '{{.State.ExitCode}}' "$NAME")
check "clean exit code on SIGTERM" "0" "$rc"
if docker exec "$NAME" true 2>/dev/null; then bad "container still running"; else
    ok "container stopped"; fi

say ""
say "docker integration: $PASS passed, $FAIL failed"
[ "$FAIL" -eq 0 ]
