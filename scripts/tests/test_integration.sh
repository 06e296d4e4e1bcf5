#!/usr/bin/env bash
# Black-box integration tests against a RUNNING gateway (reference
# scripts/tests/test_integration.sh tier, SURVEY.md §4.2): curl assertions on
# status codes, JSON validity, SSE framing, and metrics counters.  Tolerates
# 502 on inference endpoints (backend may have no model — same policy as the
# reference's "backend not ready — acceptable").
#
# Usage: GATEWAY_URL=http://localhost:8000 API_KEY=sk-... ./test_integration.sh
set -u

GATEWAY_URL="${GATEWAY_URL:-http://localhost:8000}"
API_KEY="${API_KEY:-}"
PASS=0
FAIL=0

ok()   { PASS=$((PASS+1)); echo "  PASS: $1"; }
bad()  { FAIL=$((FAIL+1)); echo "  FAIL: $1"; }

code() { curl -s -o /dev/null -w "%{http_code}" "$@"; }

echo "== gateway: $GATEWAY_URL =="

# --- public endpoints ---------------------------------------------------------
[ "$(code "$GATEWAY_URL/ping")" = "200" ] && ok "/ping 200" || bad "/ping"

health=$(curl -s "$GATEWAY_URL/health")
echo "$health" | python3 -c "import json,sys; json.load(sys.stdin)" 2>/dev/null \
    && ok "/health valid JSON" || bad "/health JSON: $health"
echo "$health" | grep -q '"gateway"' && ok "/health has gateway section" \
    || bad "/health gateway section"

metrics=$(curl -s "$GATEWAY_URL/metrics")
echo "$metrics" | python3 -c "import json,sys; json.load(sys.stdin)" 2>/dev/null \
    && ok "/metrics JSON" || bad "/metrics JSON"
curl -s -H "Accept: text/plain" "$GATEWAY_URL/metrics" \
    | grep -q "# TYPE gateway_requests_total counter" \
    && ok "/metrics prometheus" || bad "/metrics prometheus"

# --- auth ---------------------------------------------------------------------
c=$(code "$GATEWAY_URL/v1/models")
[ "$c" = "401" ] && ok "unauthenticated /v1/models -> 401" \
    || bad "unauthenticated /v1/models -> $c (want 401)"

if [ -n "$API_KEY" ]; then
    c=$(code -H "Authorization: Bearer $API_KEY" "$GATEWAY_URL/v1/models")
    case "$c" in
        200|502) ok "auth'd /v1/models -> $c" ;;
        *) bad "auth'd /v1/models -> $c (want 200 or 502)" ;;
    esac

    # chat completion — 502 acceptable when no model is loaded
    body='{"model":"any","messages":[{"role":"user","content":"hi"}],"max_tokens":4}'
    c=$(code -X POST -H "Authorization: Bearer $API_KEY" \
        -H "Content-Type: application/json" -d "$body" \
        "$GATEWAY_URL/v1/chat/completions")
    case "$c" in
        200|502) ok "chat completion -> $c" ;;
        *) bad "chat completion -> $c" ;;
    esac

    # streaming: data: lines present when 200
    stream=$(curl -s -N -X POST -H "Authorization: Bearer $API_KEY" \
        -H "Content-Type: application/json" \
        -d '{"model":"any","messages":[{"role":"user","content":"hi"}],"max_tokens":3,"stream":true}' \
        "$GATEWAY_URL/v1/chat/completions" | head -40)
    if echo "$stream" | grep -q "^data: "; then
        ok "SSE stream has data: lines"
        echo "$stream" | grep -q "data: \[DONE\]" && ok "SSE [DONE] terminator" \
            || bad "SSE missing [DONE]"
    else
        echo "  SKIP: SSE (backend not serving; got: $(echo "$stream" | head -1))"
    fi
else
    echo "  SKIP: auth'd tests (set API_KEY)"
fi

# --- metrics counters increment ----------------------------------------------
before=$(curl -s "$GATEWAY_URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['requests_total'])")
curl -s -o /dev/null "$GATEWAY_URL/ping"
after=$(curl -s "$GATEWAY_URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['requests_total'])")
[ "$after" -gt "$before" ] && ok "requests_total increments" \
    || bad "requests_total did not increment ($before -> $after)"

# --- limits -------------------------------------------------------------------
long_path=$(printf '/%.0sa' $(seq 1 9000))
c=$(code "$GATEWAY_URL$long_path")
[ "$c" = "414" ] && ok "long request line -> 414" || bad "long line -> $c"

echo
echo "passed=$PASS failed=$FAIL"
[ "$FAIL" = "0" ]
