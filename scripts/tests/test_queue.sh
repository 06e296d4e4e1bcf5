#!/usr/bin/env bash
# Queue-overflow black-box tests (reference test_gateway.py queue tier,
# asserted shell-side like reference scripts/tests/test_integration.sh):
# boots its OWN stack with MAX_CONCURRENT_REQUESTS=1 MAX_QUEUE_SIZE=1 and a
# slow mock backend, fires 4 concurrent requests, asserts EXACT overflow
# behavior: 503 + Retry-After: 5 + queue_rejections counter.
set -u
cd "$(dirname "$0")"
REPO_ROOT=$(cd ../.. && pwd)
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"

PORT="${QUEUE_TEST_PORT:-18140}"
TMP=$(mktemp -d)
PASS=0
FAIL=0
ok()  { PASS=$((PASS+1)); echo "  PASS: $1"; }
bad() { FAIL=$((FAIL+1)); echo "  FAIL: $1"; }

python3 -m llama_gguf_inference_tpu.serving.key_mgmt \
    --keys-file "$TMP/api_keys.txt" generate --key-id q --quiet > "$TMP/key.txt"
KEY=$(cat "$TMP/key.txt")

MOCK_BACKEND=true MOCK_DELAY_S=0.4 DATA_DIR="$TMP" BACKEND_KEY_DIR="$TMP" \
    GATEWAY_PORT=$PORT PORT_HEALTH=$((PORT+1)) PORT_BACKEND=$((PORT+2)) \
    AUTH_KEYS_FILE="$TMP/api_keys.txt" JAX_PLATFORMS=cpu \
    MAX_CONCURRENT_REQUESTS=1 MAX_QUEUE_SIZE=1 \
    python3 -m llama_gguf_inference_tpu.launch.start > "$TMP/stack.log" 2>&1 &
STACK=$!
trap 'kill "$STACK" 2>/dev/null; wait "$STACK" 2>/dev/null; rm -rf "$TMP"' EXIT

URL="http://127.0.0.1:$PORT"
for _ in $(seq 1 60); do
    curl -s -o /dev/null "$URL/ping" && break
    sleep 0.5
done

echo "== queue overflow: $URL (concurrent=1, queue=1) =="

body='{"model":"m","messages":[{"role":"user","content":"hi"}],"max_tokens":8}'
CURL_PIDS=()
for i in 1 2 3 4; do
    curl -s -D "$TMP/h$i" -o "$TMP/b$i" \
        -H "Authorization: Bearer $KEY" -H "Content-Type: application/json" \
        -d "$body" "$URL/v1/chat/completions" &
    CURL_PIDS+=($!)
done
for p in "${CURL_PIDS[@]}"; do wait "$p" 2>/dev/null || true; done
sleep 0.5

codes=$(head -1 "$TMP"/h? | grep -o 'HTTP/[0-9.]* [0-9]*' | awk '{print $2}' | sort | uniq -c)
echo "  codes: $(echo "$codes" | tr '\n' ' ')"
n200=$(grep -rl "HTTP/1.1 200" "$TMP"/h? 2>/dev/null | wc -l)
n503=$(grep -rl "HTTP/1.1 503" "$TMP"/h? 2>/dev/null | wc -l)

# 1 active + 1 queued succeed; the other 2 overflow with 503
[ "$n200" = "2" ] && ok "exactly 2 requests served" || bad "served=$n200 (want 2)"
[ "$n503" = "2" ] && ok "exactly 2 rejected 503" || bad "rejected=$n503 (want 2)"

for h in "$TMP"/h?; do
    if head -1 "$h" | grep -q " 503"; then
        grep -qi '^Retry-After: 5' "$h" && ok "503 carries Retry-After: 5" \
            || bad "503 missing Retry-After: 5 ($h)"
        b="${h/h/b}"
        python3 -c "import json,sys; d=json.load(open('$b')); \
            assert d['error']['type']" 2>/dev/null \
            && ok "503 body is contract error JSON" || bad "503 body ($b)"
        break
    fi
done

rej=$(curl -s "$URL/metrics" | python3 -c \
    "import json,sys; print(json.load(sys.stdin)['gateway']['queue_rejections'])")
[ "$rej" = "2" ] && ok "queue_rejections counter == 2" \
    || bad "queue_rejections=$rej (want 2)"

echo
echo "passed=$PASS failed=$FAIL"
[ "$FAIL" = "0" ]
