#!/bin/bash
# Phase E of the round-3 queue: write the committed bench-scene goldens
# (tests/golden_scene_<scene>.npz) from TPU frames at the shipped operating
# points, after all A/B measurement phases are done (the goldens must not
# exist while earlier legs run, or they would assert against themselves).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=/tmp/ab_round3e.log
: > $OUT
UNAVAIL=0
UNAVAIL_MAX=6

while pgrep -x -f "python scripts/ab_round3d.py" > /dev/null 2>&1; do sleep 60; done

leg () {
  local tag=$1; shift
  for attempt in 1 2 3; do
    echo "=== $tag (attempt $attempt, $(date +%H:%M:%S)) ===" >> $OUT
    timeout 1700 "$@" > /tmp/ab3e_leg.out 2>&1
    local rc=$?
    cat /tmp/ab3e_leg.out >> $OUT
    echo "--- exit $rc ($(date +%H:%M:%S)) ---" >> $OUT
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "Unable to initialize backend" /tmp/ab3e_leg.out; then return $rc; fi
    UNAVAIL=$((UNAVAIL+1))
    if [ $UNAVAIL -ge $UNAVAIL_MAX ]; then
      echo "## ABORT: $UNAVAIL backend-unavailable failures" >> $OUT
      exit 2
    fi
    sleep 240
  done
  return 1
}

leg "golden carpet" python scripts/bench_scene.py carpet --block 1024 \
    --max-hits 48 --step-cap 320 --cull 448 --trials 1 --write-golden
leg "golden grass" python scripts/bench_scene.py grass --step-cap 1024 \
    --max-hits 96 --cull 512 --tri-cull 1024 --shadow-cull 512 \
    --shadow-tri-cull 2048 --trials 1 --write-golden
leg "golden plush" python scripts/bench_scene.py plush --step-cap 1280 \
    --max-hits 128 --cull 384 --tri-cull 1024 --shadow-cull 768 \
    --shadow-tri-cull 1536 --trials 1 --write-golden

echo "## DONE" >> $OUT
