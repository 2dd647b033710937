#!/bin/bash
# Phase C of the round-3 queue (after scripts/ab_round3b.sh): fresh xplane
# trace captures at the final round-3 operating points, for the updated
# per-stage budgets in docs/PERF.md.  Traces land in /tmp/trace_r3_<name>/;
# parsed top-op reports in /tmp/trace_r3_<name>.txt.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=/tmp/ab_round3c.log
: > $OUT
UNAVAIL=0
UNAVAIL_MAX=6

while pgrep -x -f "bash scripts/ab_round3b.sh" > /dev/null 2>&1; do sleep 60; done
if grep -q "## ABORT\|## SKIPPED" /tmp/ab_round3b.log 2>/dev/null; then
  echo "## SKIPPED: phase B did not complete" >> $OUT
  exit 2
fi

leg () {
  local tag=$1; shift
  for attempt in 1 2 3; do
    echo "=== $tag (attempt $attempt, $(date +%H:%M:%S)) ===" >> $OUT
    timeout 1700 "$@" > /tmp/ab3c_leg.out 2>&1
    local rc=$?
    cat /tmp/ab3c_leg.out >> $OUT
    echo "--- exit $rc ($(date +%H:%M:%S)) ---" >> $OUT
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "Unable to initialize backend" /tmp/ab3c_leg.out; then return $rc; fi
    UNAVAIL=$((UNAVAIL+1))
    if [ $UNAVAIL -ge $UNAVAIL_MAX ]; then
      echo "## ABORT: $UNAVAIL backend-unavailable failures" >> $OUT
      exit 2
    fi
    sleep 240
  done
  return 1
}

leg "trace carpet" python scripts/bench_scene.py carpet --block 1024 \
    --max-hits 48 --step-cap 320 --cull 448 --trace /tmp/trace_r3_carpet
leg "trace grass" python scripts/bench_scene.py grass --step-cap 1024 \
    --max-hits 96 --cull 512 --tri-cull 1024 --shadow-cull 512 \
    --shadow-tri-cull 2048 --trace /tmp/trace_r3_grass
leg "trace plush" python scripts/bench_scene.py plush --step-cap 1280 \
    --max-hits 128 --cull 384 --tri-cull 1024 --shadow-cull 768 \
    --shadow-tri-cull 1536 --trace /tmp/trace_r3_plush
leg "trace train" python scripts/bench_train.py --k 50 --reps 2 \
    --dtype bfloat16 --net-chunk 16384 --remat --trace /tmp/trace_r3_train

for name in carpet grass plush train; do
  pb=$(ls /tmp/trace_r3_$name/plugins/profile/*/*.xplane.pb 2>/dev/null | head -1)
  if [ -n "$pb" ]; then
    python scripts/parse_xplane.py "$pb" self 25 > /tmp/trace_r3_$name.txt 2>&1
  fi
done

echo "## DONE" >> $OUT
