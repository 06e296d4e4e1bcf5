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

# public endpoints ignore INVALID auth headers (reference test_health.sh
# test_health_with_auth_header)
c=$(code -H "Authorization: Bearer invalid-key-12345" "$GATEWAY_URL/ping")
[ "$c" = "200" ] && ok "/ping with bad auth still 200" || bad "/ping bad auth -> $c"

# --- expired + rate-limited key matrix (needs control of the key file) -------
if [ -n "${KEYS_FILE:-}" ] && [ -n "$API_KEY" ]; then
    gen_key() { python3 -c "import secrets; print('sk-' + secrets.token_urlsafe(32))"; }

    EXPIRED_KEY=$(gen_key)
    LIMITED_KEY=$(gen_key)
    FUTURE_KEY=$(gen_key)
    # key_id:api_key[:rate_limit][:expiration] lines (docs/API_REFERENCE.md)
    {
        echo "expired-key:$EXPIRED_KEY::2020-01-01"
        echo "limited-key:$LIMITED_KEY:2:"
        echo "future-key:$FUTURE_KEY::2099-01-01"
    } >> "$KEYS_FILE"
    curl -s -o /dev/null -X POST -H "Authorization: Bearer $API_KEY" \
        "$GATEWAY_URL/reload"

    c=$(code -H "Authorization: Bearer $EXPIRED_KEY" "$GATEWAY_URL/v1/models")
    [ "$c" = "401" ] && ok "expired key -> 401" || bad "expired key -> $c"

    c=$(code -H "Authorization: Bearer $FUTURE_KEY" "$GATEWAY_URL/v1/models")
    case "$c" in 200|502) ok "future-dated key accepted -> $c" ;; \
        *) bad "future-dated key -> $c" ;; esac

    # rate limit 2/min: third request inside the window must 429 + Retry-After
    code -H "Authorization: Bearer $LIMITED_KEY" "$GATEWAY_URL/v1/models" >/dev/null
    code -H "Authorization: Bearer $LIMITED_KEY" "$GATEWAY_URL/v1/models" >/dev/null
    hdrs=$(curl -s -D - -o /dev/null -H "Authorization: Bearer $LIMITED_KEY" \
        "$GATEWAY_URL/v1/models")
    echo "$hdrs" | head -1 | grep -q " 429" && ok "rate-limited key -> 429" \
        || bad "rate limit: $(echo "$hdrs" | head -1)"
    echo "$hdrs" | grep -qi "^Retry-After: 60" && ok "429 Retry-After: 60" \
        || bad "429 missing Retry-After: 60"
    body=$(curl -s -H "Authorization: Bearer $LIMITED_KEY" "$GATEWAY_URL/v1/models")
    echo "$body" | grep -q '"rate_limit_error"' && ok "429 error type field" \
        || bad "429 body: $body"

    # other keys are unaffected by one key's rate limit
    c=$(code -H "Authorization: Bearer $API_KEY" "$GATEWAY_URL/v1/models")
    case "$c" in 200|502) ok "other keys unaffected by 429" ;; \
        *) bad "other key after 429 -> $c" ;; esac
else
    echo "  SKIP: expired/rate-limit matrix (set KEYS_FILE + API_KEY)"
fi

# unauthorized counter increments on a 401
u_before=$(curl -s "$GATEWAY_URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['requests_unauthorized'])")
code "$GATEWAY_URL/v1/models" >/dev/null
u_after=$(curl -s "$GATEWAY_URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['requests_unauthorized'])")
[ "$u_after" -gt "$u_before" ] && ok "requests_unauthorized increments" \
    || bad "requests_unauthorized $u_before -> $u_after"

echo
echo "passed=$PASS failed=$FAIL"
[ "$FAIL" = "0" ]
