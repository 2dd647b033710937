"""Round-4 phase H: full-frame A/B of the segment-walk reformulations.

The phase-F microbench (runlogs/round4f/queue.log) measured, at plush block
dims in isolation: running-select segment walk 2.3x the one-hot count+pick,
per-channel-plane table select 3.1x the 4-D reduce.  This phase measures
them in-frame: the two gates separately on plush (the scene where the
families cost ~23% — PERF §2.13), then both together on all three scenes
plus bench.py.  OFF baselines = the round4e packed-permute-ON legs (same
shipped defaults, same session).

Waits for round4g.  Run via:
  cd /root/repo && setsid nohup python -u scripts/ab_round4h.py \
      > runlogs/round4h/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH  # noqa: E402
from ab_round4b import other_queue_running  # noqa: E402
from ab_round4f import queue_finished  # noqa: E402
from queue_runner import Queue  # noqa: E402

CARPET = CARPET_S + ["--tri-cull", "512"]
BOTH = {"NERFTEX_RUNSEL_WALK": "1", "NERFTEX_DMAJOR_SELECT": "1"}


def main():
    while not queue_finished("round4g"):
        time.sleep(120)
    while any(other_queue_running(q) for q in
              ("round4", "round4b", "round4c", "round4e", "round4f", "round4g")):
        time.sleep(120)

    q = Queue("round4h", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "150")))
    q.leg("plush dmajor", {"NERFTEX_DMAJOR_SELECT": "1"}, PLUSH, timeout=2400)
    q.leg("plush runsel", {"NERFTEX_RUNSEL_WALK": "1"}, PLUSH, timeout=2400)
    q.leg("plush both", BOTH, PLUSH, timeout=2400)
    q.leg("grass both", BOTH, GRASS)
    q.leg("carpet both", BOTH, CARPET)
    q.leg("bench both", BOTH, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
