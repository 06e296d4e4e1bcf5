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

# TPU / accelerator info
{
    python3 - <<'EOF' 2>&1
import jax
for d in jax.devices():
    print(d, d.platform, getattr(d, "device_kind", "?"))
EOF
} > "$WORK/devices.txt" 2>&1 || true

# environment, SANITIZED: drop anything secret-looking (reference :79-85)
env | grep -viE "key|password|token|secret|credential" | sort > "$WORK/env.txt"

ps aux > "$WORK/processes.txt" 2>&1 || true
(ss -tlnp 2>/dev/null || netstat -tlnp 2>/dev/null || true) > "$WORK/listeners.txt"

# model listing (names + sizes only)
ls -la "$DATA_DIR/models" > "$WORK/models.txt" 2>&1 || true

# recent logs (last 500 lines each)
mkdir -p "$WORK/logs"
if [ -d "$DATA_DIR/logs" ]; then
    find "$DATA_DIR/logs" -name "*.log" -type f 2>/dev/null | while read -r f; do
        tail -500 "$f" > "$WORK/logs/$(basename "$f")" 2>/dev/null || true
    done
fi

# gateway state snapshots (never include keys)
for ep in ping health metrics; do
    curl -s --max-time 3 "http://127.0.0.1:${GATEWAY_PORT:-8000}/$ep" \
        > "$WORK/gateway_$ep.json" 2>/dev/null || true
done

tar -czf "$BUNDLE" -C "$WORK" .
rm -rf "$WORK"
echo "wrote $BUNDLE"
