#!/bin/sh
# Stop every builder-owned measurement queue by PIDFILE (never by process-
# name pattern: pattern kills can match the operator's own session).
# Also drops runlogs/KILL so a queue that is mid-leg stops at the next
# between-legs checkpoint.  Invoke before any driver capture window
# (VERDICT r3 weak #2: a leftover queue held the TPU during the MULTICHIP
# capture).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/runlogs"
touch "$REPO/runlogs/KILL"
for pidfile in "$REPO"/runlogs/*/queue.pid; do
    [ -f "$pidfile" ] || continue
    pid="$(cat "$pidfile" 2>/dev/null)" || continue
    case "$pid" in *[!0-9]*|"") continue;; esac
    if kill -0 "$pid" 2>/dev/null; then
        echo "killing queue pid $pid ($pidfile)"
        # Negative pid = process group (queues start with setsid so their
        # in-flight bench subprocesses die too); fall back to the single pid.
        kill -TERM -- "-$pid" 2>/dev/null || kill -TERM "$pid" 2>/dev/null
    fi
    rm -f "$pidfile"
done
echo "done. remove $REPO/runlogs/KILL before starting new queues."
