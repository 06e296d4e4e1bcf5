#!/usr/bin/env bash
# Health-sidecar black-box tests (reference scripts/tests/test_health.sh tier):
# every GET on every path must return 200 with an empty body.
set -u

HEALTH_URL="${HEALTH_URL:-http://localhost:8001}"
PASS=0
FAIL=0
ok()  { PASS=$((PASS+1)); echo "  PASS: $1"; }
bad() { FAIL=$((FAIL+1)); echo "  FAIL: $1"; }

echo "== health sidecar: $HEALTH_URL =="
for path in "/" "/health" "/ping" "/anything/nested/path" "/v1/models"; do
    c=$(curl -s -o /dev/null -w "%{http_code}" "$HEALTH_URL$path")
    [ "$c" = "200" ] && ok "GET $path -> 200" || bad "GET $path -> $c"
done

body=$(curl -s "$HEALTH_URL/")
[ -z "$body" ] && ok "empty body" || bad "body not empty: $body"

echo
echo "passed=$PASS failed=$FAIL"
[ "$FAIL" = "0" ]
