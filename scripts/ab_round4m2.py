"""Round-4 phase M2: finish phase M (plush trace + final bench).

The round4m plush/bench legs raced a working-tree edit to models/mlp.py
(the queue imports the repo live, and an in-progress edit between its legs
broke two of them deterministically).  The fix is committed (babb5d5);
this finisher re-runs exactly the two failed legs.  Lesson recorded in
CLAUDE.md: never edit hot-path modules while a measurement queue is
running.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4m2.py \
              > runlogs/round4m2/nohup.out 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import PLUSH  # noqa: E402
from ab_round4m import parse_trace  # noqa: E402
import ab_round4m  # noqa: E402
from queue_runner import REPO, Queue  # noqa: E402

TRACE_DIR = os.path.join(REPO, "runlogs", "round4m")
ab_round4m.TRACE_DIR = TRACE_DIR  # parse into the phase-M home


def main():
    q = Queue("round4m2", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "90")))
    if q.leg("trace plush", {},
             PLUSH + ["--trials", "1", "--trace", f"{TRACE_DIR}/trace_plush"],
             timeout=2400):
        parse_trace(q, "plush")
    q.leg("final bench", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
