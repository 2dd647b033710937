#!/bin/bash
# Same-session A/B chain for the round-3 gather/top-K/event optimizations
# (docs/PERF.md §2.9-2.10).  Four variants per scene, adjacent so TPU
# service drift is shared; each adds one optimization:
#   base   = PACKED=0 TOPK=0 CUMSUM=0   (§2.8 code)
#   packed = TOPK=0 CUMSUM=0            (+ packed inst-table gather)
#   topk   = CUMSUM=0                   (+ top_k interval selection)
#   cumsum = defaults                   (+ sort-carried event counts)
# Each leg retries on axon-UNAVAILABLE (service reclaim/outage).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=/tmp/ab_packed.log
: > $OUT
UNAVAIL=0         # global backend-unavailable budget: abort the chain
UNAVAIL_MAX=14    # rather than churn 25-min failures for days

leg () {
  local tag=$1; shift
  for attempt in 1 2 3 4 5 6; do
    echo "=== $tag (attempt $attempt, $(date +%H:%M:%S)) ===" >> $OUT
    timeout 1700 "$@" > /tmp/ab_leg.out 2>&1
    local rc=$?
    cat /tmp/ab_leg.out >> $OUT
    echo "--- exit $rc ($(date +%H:%M:%S)) ---" >> $OUT
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "Unable to initialize backend" /tmp/ab_leg.out; then return $rc; fi
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
CARPET=(python bench.py)

for scene in PLUSH GRASS CARPET; do
  declare -n CMD=$scene
  NERFTEX_PACKED_GATHER=0 NERFTEX_TOPK_SELECT=0 NERFTEX_EVENT_CUMSUM=0 leg "$scene base"   "${CMD[@]}"
  NERFTEX_TOPK_SELECT=0 NERFTEX_EVENT_CUMSUM=0                         leg "$scene packed" "${CMD[@]}"
  NERFTEX_EVENT_CUMSUM=0                                               leg "$scene topk"   "${CMD[@]}"
                                                                       leg "$scene cumsum" "${CMD[@]}"
done
echo "## DONE" >> $OUT
