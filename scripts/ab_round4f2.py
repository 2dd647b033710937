"""Round-4 phase F2: micro group 4 — overlap-resolution (sel_k) orientation.

Squeezed between F and E: times the [Rb,S,K] active/distance/blend-cumsum
chain (the inside of the select_reduce tier fusions) in K-minor vs S-minor
orientation at plush and grass dims.  Waits for round4f.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4f2.py \
              > runlogs/round4f2/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4b import other_queue_running  # noqa: E402
from ab_round4f import queue_finished  # noqa: E402
from queue_runner import Queue  # noqa: E402


def main():
    while not queue_finished("round4f"):
        time.sleep(60)
    while any(other_queue_running(q) for q in
              ("round4", "round4b", "round4c", "round4f")):
        time.sleep(60)

    q = Queue("round4f2", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "45")))
    base = ["python", "scripts/micro_select.py", "--reps", "20", "--groups", "4"]
    q.leg("selk plush S320", {}, base + ["--s", "320", "--k", "128"])
    q.leg("selk plush S1280", {}, base + ["--s", "1280", "--k", "128"])
    q.leg("selk grass S256", {}, base + ["--s", "256", "--k", "96"])
    q.done()


if __name__ == "__main__":
    main()
