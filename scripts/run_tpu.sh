#!/bin/sh
# Serialize TPU jobs: retry while the chip claim fails (single-tenant tunnel).
export PYTHONPATH=/root/repo
for i in 1 2 3 4 5 6 7 8 9 10; do
    python "$@" && exit 0
    if grep -q "known backends" /tmp/last_tpu_err 2>/dev/null; then :; fi
    echo "RETRY $i after failure" >&2
    sleep 30
done
exit 1
