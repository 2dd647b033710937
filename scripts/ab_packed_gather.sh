#!/bin/bash
# Same-session A/B for the packed per-instance table gather (device.py,
# docs/PERF.md §2.9).  Base = NERFTEX_PACKED_GATHER=0 (piecewise gathers),
# New = default (packed).  Adjacent base/new pairs per scene so service
# drift is shared; each leg retries on axon-UNAVAILABLE (service reclaim).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=/tmp/ab_packed.log
: > $OUT

leg () {
  local tag=$1; shift
  for attempt in 1 2 3 4; do
    echo "=== $tag (attempt $attempt, $(date +%H:%M:%S)) ===" >> $OUT
    timeout 1700 "$@" > /tmp/ab_leg.out 2>&1
    local rc=$?
    cat /tmp/ab_leg.out >> $OUT
    echo "--- exit $rc ---" >> $OUT
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "Unable to initialize backend" /tmp/ab_leg.out; then return $rc; fi
    sleep 180
  done
  return 1
}

PLUSH_ARGS=(plush --step-cap 1280 --max-hits 128 --cull 384 --tri-cull 1024 --shadow-cull 768 --shadow-tri-cull 1536)
GRASS_ARGS=(grass --step-cap 1024 --max-hits 96 --cull 512 --tri-cull 1024 --shadow-cull 512 --shadow-tri-cull 2048)

NERFTEX_PACKED_GATHER=0 leg "plush base" python scripts/bench_scene.py "${PLUSH_ARGS[@]}"
leg "plush new" python scripts/bench_scene.py "${PLUSH_ARGS[@]}"
NERFTEX_PACKED_GATHER=0 leg "grass base" python scripts/bench_scene.py "${GRASS_ARGS[@]}"
leg "grass new" python scripts/bench_scene.py "${GRASS_ARGS[@]}"
NERFTEX_PACKED_GATHER=0 leg "carpet base" python bench.py
leg "carpet new" python bench.py
echo "## DONE" >> $OUT
