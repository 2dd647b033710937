"""Round-4 phase O: in-frame A/B of NERFTEX_SELK_BARRIER.

The round-4m plush trace still attributes ~488 ms (19% of the 2510 ms
frame) to the overlap-resolution convert_reduce family (PERF §2.17).
Phase-N micros (runlogs/round4n/queue.log, micro_select group 7) showed
splitting the mega-fusion with optimization_barriers is bit-identical and
 -38% at plush dims (13.87 -> 8.52 ms/exec), -22% at grass dims.  This
queue measures the barrier gate in-frame; controls run in-session.

Ordered plush-first (largest expected win) under a hard deadline so the
driver's round-end capture never overlaps a running leg.  Run via:
  cd /root/repo && setsid nohup python -u scripts/ab_round4o.py \
      > runlogs/round4o/nohup.out 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH  # noqa: E402
from queue_runner import Queue  # noqa: E402

BAR = {"NERFTEX_SELK_BARRIER": "1"}


def main():
    q = Queue("round4o", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "40")))
    q.leg("plush barrier", BAR, PLUSH, timeout=1500)
    q.leg("plush control", {}, PLUSH, timeout=1500)
    q.leg("grass barrier", BAR, GRASS, timeout=1200)
    q.leg("grass control", {}, GRASS, timeout=1200)
    q.leg("bench barrier", BAR, ["python", "bench.py"], timeout=1200)
    q.leg("bench control", {}, ["python", "bench.py"], timeout=1200)
    q.done()


if __name__ == "__main__":
    main()
