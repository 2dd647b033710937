"""Round-4 phase L: in-frame A/B of the event-table layout/pick gates.

The fresh round4k plush trace attributes ~511 ms (20% of the 2561 ms
frame) to the convert_reduce segment-count family, all consuming ray-minor
{0,1} operands from the sort/cumsum producers.  Two bit-exact candidates
(micro evidence in runlogs/round4l/micro*.log, harness groups 5-6):

  NERFTEX_EVENT_RELAYOUT  — materialize the event/hit tables row-major
                            before the [Rb,S,*] consumers;
  NERFTEX_INTERVAL_PICK   — segment pick as one interval-membership
                            where/sum, no s32 count intermediate.

Controls run in-session per scene.  Run via:
  cd /root/repo && setsid nohup python -u scripts/ab_round4l.py \
      > runlogs/round4l/nohup.out 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH  # noqa: E402
from queue_runner import Queue  # noqa: E402

RELAY = {"NERFTEX_EVENT_RELAYOUT": "1"}
IPICK = {"NERFTEX_INTERVAL_PICK": "1"}
BOTH = {**RELAY, **IPICK}


def main():
    q = Queue("round4l", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "150")))
    q.leg("plush control", {}, PLUSH, timeout=2400)
    q.leg("plush relayout", RELAY, PLUSH, timeout=2400)
    q.leg("plush ipick", IPICK, PLUSH, timeout=2400)
    q.leg("plush both", BOTH, PLUSH, timeout=2400)
    q.leg("grass control", {}, GRASS)
    q.leg("grass both", BOTH, GRASS)
    q.leg("bench both", BOTH, ["python", "bench.py"])
    q.leg("bench control", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
