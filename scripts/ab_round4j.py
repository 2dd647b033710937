"""Round-4 phase J: DMAJOR_SELECT-alone legs missing from phase H.

Phase H (runlogs/round4h/queue.log) measured plush dmajor-alone at 234.1k
rays/s (+3.3% over the packed-permute baseline 226.7k) and runsel-alone at
200.9k (-11%), but only ran the grass/carpet legs with BOTH gates on —
confounded by runsel's regression.  This phase isolates dmajor on grass and
carpet (at the adopted tri384) plus an in-frame bench.py A/B, so the
default flip decision rests on per-scene dmajor-alone data.

Baselines (same shipped defaults, runlogs/round4e + round4g):
  grass 217,057 | carpet-tri384 scene 535,773 | bench-tri384 494,986.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4j.py \
              > runlogs/round4j/nohup.out 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS  # noqa: E402
from queue_runner import Queue  # noqa: E402

CARPET = CARPET_S + ["--tri-cull", "384"]
DM = {"NERFTEX_DMAJOR_SELECT": "1"}


def main():
    q = Queue("round4j", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "90")))
    q.leg("grass dmajor", DM, GRASS)
    q.leg("carpet dmajor", DM, CARPET)
    q.leg("bench dmajor", DM, ["python", "bench.py"])
    q.leg("bench control", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
