#!/usr/bin/env bash
# Diagnostics bundle collector (reference scripts/diagnostics/collect.sh,
# SURVEY.md §2.7): system + TPU info, sanitized environment, processes, port
# listeners, model listing, recent logs -> timestamped tarball.
set -u

OUT_DIR="${1:-/tmp}"
TS=$(date -u +%Y%m%dT%H%M%SZ)
WORK=$(mktemp -d)
BUNDLE="$OUT_DIR/diagnostics_${TS}.tar.gz"
DATA_DIR="${DATA_DIR:-/data}"

echo "collecting diagnostics into $BUNDLE"

{
    echo "=== timestamp ==="; date -u
    echo "=== uname ==="; uname -a
    echo "=== python ==="; python3 --version 2>&1
    echo "=== versions ==="
    python3 -c "import jax, jaxlib; print('jax', jax.__version__, 'jaxlib', jaxlib.__version__)" 2>&1
    cat /app/VERSION 2>/dev/null || true
} > "$WORK/system.txt" 2>&1

# TPU / accelerator info, incl. per-device memory stats (the reference
# gathers nvidia-smi VRAM detail; memory_stats is the TPU equivalent)
{
    timeout 30 python3 - <<'PYEOF' 2>&1 || echo '(device probe timed out — another process may hold the TPU)'
import jax
for d in jax.devices():
    print(d, d.platform, getattr(d, "device_kind", "?"))
    try:
        ms = d.memory_stats() or {}
        for k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use",
                  "largest_free_block_bytes", "num_allocs"):
            if k in ms:
                print(f"  {k}: {ms[k]:,}")
    except Exception as e:
        print(f"  (memory_stats unavailable: {e})")
try:
    import jax.numpy as jnp
    x = jnp.zeros(8)
    print("device smoke test:", float(x.sum()))
except Exception as e:
    print("device smoke test FAILED:", e)
PYEOF
} > "$WORK/devices.txt" 2>&1 || true

# host memory + disk pressure
{
    echo "=== free ==="; free -h 2>/dev/null || true
    echo "=== df (data + tmp) ==="; df -h "$DATA_DIR" /tmp 2>/dev/null || true
    echo "=== meminfo head ==="; head -10 /proc/meminfo 2>/dev/null || true
    echo "=== loadavg ==="; cat /proc/loadavg 2>/dev/null || true
} > "$WORK/resources.txt" 2>&1 || true

# XLA compile cache state (cold-start debugging)
{
    echo "=== /tmp/jax_comp_cache ==="
    ls -la /tmp/jax_comp_cache 2>/dev/null | head -50 || echo "(absent)"
    du -sh /tmp/jax_comp_cache 2>/dev/null || true
} > "$WORK/compile_cache.txt" 2>&1 || true

# environment, SANITIZED: drop anything secret-looking (reference :79-85)
env | grep -viE "key|password|token|secret|credential" | sort > "$WORK/env.txt"

ps aux > "$WORK/processes.txt" 2>&1 || true
(ss -tlnp 2>/dev/null || netstat -tlnp 2>/dev/null || true) > "$WORK/listeners.txt"

# model listing (names + sizes only) + layout-cache manifests
ls -la "$DATA_DIR/models" > "$WORK/models.txt" 2>&1 || true
find "$DATA_DIR/models" -maxdepth 2 -name "*.lgtcache*" 2>/dev/null \
    -exec ls -la {} \; >> "$WORK/models.txt" 2>/dev/null || true

# key FILE metadata only — never contents (reference never bundles secrets)
{
    for f in "$DATA_DIR/api_keys.txt" "${AUTH_KEYS_FILE:-}"; do
        [ -n "$f" ] && [ -e "$f" ] && stat -c "%n %a %s bytes %y" "$f"
    done
    grep -c ":" "$DATA_DIR/api_keys.txt" 2>/dev/null \
        | sed 's/^/key lines: /' || true
} > "$WORK/keyfile_meta.txt" 2>&1 || true

# recent logs (last 500 lines each)
mkdir -p "$WORK/logs"
if [ -d "$DATA_DIR/logs" ]; then
    find "$DATA_DIR/logs" -name "*.log" -type f 2>/dev/null | while read -r f; do
        tail -500 "$f" > "$WORK/logs/$(basename "$f")" 2>/dev/null || true
    done
fi

# gateway + backend state snapshots (never include keys)
for ep in ping health metrics; do
    curl -s --max-time 3 "http://127.0.0.1:${GATEWAY_PORT:-8000}/$ep" \
        > "$WORK/gateway_$ep.json" 2>/dev/null || true
done
curl -s --max-time 3 "http://127.0.0.1:${PORT_HEALTH:-8001}/" \
    -o /dev/null -w "health sidecar: %{http_code}\n" \
    > "$WORK/health_sidecar.txt" 2>/dev/null || true
# backend /health requires the backend key; record reachability only
curl -s --max-time 3 "http://127.0.0.1:${PORT_BACKEND:-8080}/health" \
    -o /dev/null -w "backend /health (unauthenticated): %{http_code}\n" \
    > "$WORK/backend_reach.txt" 2>/dev/null || true

tar -czf "$BUNDLE" -C "$WORK" .
rm -rf "$WORK"
echo "wrote $BUNDLE"
