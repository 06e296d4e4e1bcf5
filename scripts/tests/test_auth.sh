#!/usr/bin/env bash
# Auth black-box tests (reference scripts/tests/test_auth.sh tier).
# Usage: GATEWAY_URL=... API_KEY=<valid key> ./test_auth.sh
set -u

GATEWAY_URL="${GATEWAY_URL:-http://localhost:8000}"
API_KEY="${API_KEY:-}"
PASS=0
FAIL=0
ok()  { PASS=$((PASS+1)); echo "  PASS: $1"; }
bad() { FAIL=$((FAIL+1)); echo "  FAIL: $1"; }
code() { curl -s -o /dev/null -w "%{http_code}" "$@"; }

echo "== auth: $GATEWAY_URL =="

c=$(code "$GATEWAY_URL/v1/models")
[ "$c" = "401" ] && ok "missing header -> 401" || bad "missing header -> $c"

body=$(curl -s "$GATEWAY_URL/v1/models")
echo "$body" | grep -q '"invalid_api_key"' && ok "401 error code field" \
    || bad "401 body: $body"

c=$(code -H "Authorization: Bearer " "$GATEWAY_URL/v1/models")
[ "$c" = "401" ] && ok "empty bearer -> 401" || bad "empty bearer -> $c"

c=$(code -H 'Authorization: Bearer $$bad$$chars$$here$$' "$GATEWAY_URL/v1/models")
[ "$c" = "401" ] && ok "bad format -> 401" || bad "bad format -> $c"

c=$(code -H "Authorization: Bearer sk-wrong-$(printf 'x%.0s' $(seq 1 24))" \
    "$GATEWAY_URL/v1/models")
[ "$c" = "401" ] && ok "wrong key -> 401" || bad "wrong key -> $c"

if [ -n "$API_KEY" ]; then
    c=$(code -H "Authorization: Bearer $API_KEY" "$GATEWAY_URL/v1/models")
    case "$c" in 200|502) ok "valid key (Bearer) -> $c" ;; *) bad "valid key -> $c" ;; esac
    c=$(code -H "Authorization: $API_KEY" "$GATEWAY_URL/v1/models")
    case "$c" in 200|502) ok "valid key (no prefix) -> $c" ;; *) bad "no prefix -> $c" ;; esac
else
    echo "  SKIP: valid-key tests (set API_KEY)"
fi

# public endpoints stay public
for p in /ping /health /metrics; do
    c=$(code "$GATEWAY_URL$p")
    [ "$c" = "200" ] && ok "$p needs no auth" || bad "$p -> $c"
done

echo
echo "passed=$PASS failed=$FAIL"
[ "$FAIL" = "0" ]
