#!/usr/bin/env bash
# Health black-box tests (reference scripts/tests/test_health.sh tier):
# gateway /ping + /health + /metrics (valid JSON, "gateway" section, no auth
# required, invalid auth ignored) and the scale-to-zero sidecar (every GET on
# every path returns 200 with an empty body).
#
# Usage: GATEWAY_URL=... HEALTH_URL=... ./test_health.sh
set -u

GATEWAY_URL="${GATEWAY_URL:-http://localhost:8000}"
HEALTH_URL="${HEALTH_URL:-http://localhost:8001}"
PASS=0
FAIL=0
ok()  { PASS=$((PASS+1)); echo "  PASS: $1"; }
bad() { FAIL=$((FAIL+1)); echo "  FAIL: $1"; }
code() { curl -s -o /dev/null -w "%{http_code}" "$@"; }
is_json() { python3 -c "import json,sys; json.load(sys.stdin)" 2>/dev/null; }

# --- gateway health surface ---------------------------------------------------
echo "== gateway health: $GATEWAY_URL =="

c=$(code "$GATEWAY_URL/ping")
[ "$c" = "200" ] && ok "/ping -> 200" || bad "/ping -> $c"

body=$(curl -s "$GATEWAY_URL/health")
echo "$body" | is_json && ok "/health valid JSON" || bad "/health JSON: $body"
echo "$body" | grep -q '"gateway"' && ok "/health has gateway field" \
    || bad "/health missing gateway field"

body=$(curl -s "$GATEWAY_URL/metrics")
echo "$body" | is_json && ok "/metrics valid JSON" || bad "/metrics JSON"
echo "$body" | grep -q '"gateway"' && ok "/metrics has gateway field" \
    || bad "/metrics missing gateway field"

# no Authorization header required on any health endpoint
allc="$(code "$GATEWAY_URL/ping")/$(code "$GATEWAY_URL/health")/$(code "$GATEWAY_URL/metrics")"
[ "$allc" = "200/200/200" ] && ok "health endpoints need no auth" \
    || bad "health endpoints without auth: $allc"

# an INVALID Authorization header must not break them either
c=$(code -H "Authorization: Bearer invalid-key-12345" "$GATEWAY_URL/ping")
[ "$c" = "200" ] && ok "/ping ignores invalid auth header" \
    || bad "/ping with bad auth -> $c"
c=$(code -H "Authorization: Bearer invalid-key-12345" "$GATEWAY_URL/health")
[ "$c" = "200" ] && ok "/health ignores invalid auth header" \
    || bad "/health with bad auth -> $c"

# health GETs never count as unauthorized
u_before=$(curl -s "$GATEWAY_URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['requests_unauthorized'])")
curl -s -o /dev/null -H "Authorization: Bearer nope" "$GATEWAY_URL/health"
u_after=$(curl -s "$GATEWAY_URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['requests_unauthorized'])")
[ "$u_after" = "$u_before" ] && ok "health GET does not bump requests_unauthorized" \
    || bad "requests_unauthorized $u_before -> $u_after on /health"

# --- scale-to-zero sidecar ----------------------------------------------------
echo "== health sidecar: $HEALTH_URL =="

sidecar_up=$(code "$HEALTH_URL/" || true)
if [ "$sidecar_up" = "200" ]; then
    for path in "/" "/health" "/ping" "/anything/nested/path" "/v1/models"; do
        c=$(code "$HEALTH_URL$path")
        [ "$c" = "200" ] && ok "sidecar GET $path -> 200" \
            || bad "sidecar GET $path -> $c"
    done
    body=$(curl -s "$HEALTH_URL/")
    [ -z "$body" ] && ok "sidecar empty body" || bad "sidecar body: $body"
else
    # reference treats an absent sidecar as non-fatal (test_health.sh
    # test_health_server): scale-to-zero stacks may not run it locally
    echo "  SKIP: sidecar not accessible at $HEALTH_URL (code=$sidecar_up)"
fi

echo
echo "passed=$PASS failed=$FAIL"
[ "$FAIL" = "0" ]
