"""Round-4 phase I: micro_select rerun with the DCE-proof harness.

The phase-F/F2 harness built its loop carry from out[0,0], letting XLA
slice some variants down to one element ("count base 0.006 ms", "selk
0.008 ms" were fake).  The carry now reduces over every output element;
this rerun re-measures all four groups at the three tiers so PERF §2.15
documents trustworthy numbers.  Waits for round4h.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4i.py \
              > runlogs/round4i/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4b import other_queue_running  # noqa: E402
from ab_round4f import queue_finished  # noqa: E402
from queue_runner import Queue  # noqa: E402


def main():
    while not queue_finished("round4h"):
        time.sleep(120)
    while any(other_queue_running(q) for q in
              ("round4", "round4b", "round4c", "round4e", "round4f",
               "round4f2", "round4g", "round4h")):
        time.sleep(120)

    q = Queue("round4i", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "60")))
    base = ["python", "scripts/micro_select.py", "--reps", "20", "--groups", "1234"]
    q.leg("micro2 plush S320", {}, base + ["--s", "320", "--k", "128"])
    q.leg("micro2 plush S1280", {}, base + ["--s", "1280", "--k", "128"])
    q.leg("micro2 grass S256", {}, base + ["--s", "256", "--k", "96"])
    q.done()


if __name__ == "__main__":
    main()
