#!/bin/bash
# Phase B of the round-3 A/B queue (runs after scripts/ab_round3.sh):
#   1. NERFTEX_SELECT_COEFS=1 legs for all three scenes (vs the phase-A
#      "cumsum" legs, which are the defaults-on baseline) — decides the
#      SELECT_COEFS default (docs/PERF.md §2.10).
#   2. Carpet primary tri-cull sweep (tri-cull 0/512/1024/2048) — carpet
#      runs full Moller-Trumbore vs its 4,418-tri cloth mesh every block;
#      §2.8 made tri-cull an exact branch but carpet never got a tier.
#      Sweep legs share one harness (bench_render.py) so they A/B cleanly.
# Waits for the phase-A chain to exit first; skips everything if phase A
# aborted on the backend-unavailable budget.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=/tmp/ab_round3b.log
: > $OUT
UNAVAIL=0
UNAVAIL_MAX=10

# -- wait for phase A ------------------------------------------------------
while pgrep -x -f "bash scripts/ab_round3.sh" > /dev/null 2>&1; do sleep 60; done
if grep -q "## ABORT" /tmp/ab_packed.log 2>/dev/null; then
  echo "## SKIPPED: phase A aborted (backend unavailable)" >> $OUT
  exit 2
fi

leg () {
  local tag=$1; shift
  for attempt in 1 2 3 4 5 6; do
    echo "=== $tag (attempt $attempt, $(date +%H:%M:%S)) ===" >> $OUT
    timeout 1700 "$@" > /tmp/ab3b_leg.out 2>&1
    local rc=$?
    cat /tmp/ab3b_leg.out >> $OUT
    echo "--- exit $rc ($(date +%H:%M:%S)) ---" >> $OUT
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "Unable to initialize backend" /tmp/ab3b_leg.out; then return $rc; fi
    UNAVAIL=$((UNAVAIL+1))
    if [ $UNAVAIL -ge $UNAVAIL_MAX ]; then
      echo "## ABORT: $UNAVAIL backend-unavailable failures" >> $OUT
      exit 2
    fi
    sleep 240
  done
  return 1
}

PLUSH=(python scripts/bench_scene.py plush --step-cap 1280 --max-hits 128 --cull 384 --tri-cull 1024 --shadow-cull 768 --shadow-tri-cull 1536)
GRASS=(python scripts/bench_scene.py grass --step-cap 1024 --max-hits 96 --cull 512 --tri-cull 1024 --shadow-cull 512 --shadow-tri-cull 2048)

# 1. SELECT_COEFS on top of the defaults (phase A "cumsum" legs = control)
NERFTEX_SELECT_COEFS=1 leg "PLUSH coefs"  "${PLUSH[@]}"
NERFTEX_SELECT_COEFS=1 leg "GRASS coefs"  "${GRASS[@]}"
NERFTEX_SELECT_COEFS=1 leg "CARPET coefs" python bench.py

# 2. Carpet tri-cull sweep — REMOVED: the chunk-262144 bench_render harness
# runs the compact path, whose lane-padded interface arrays OOM the compile
# (21.5 GB, commit 3403a68; now guarded by _check_compact_capacity).
# scripts/ab_round3g.py sweeps tri-cull on the sorted-grid harness instead
# (the program bench.py actually times).

# 3. Fresh driver bench datapoint at the end of the queue
leg "CARPET final bench" python bench.py

echo "## DONE" >> $OUT
