"""Round-4 phase F: on-chip microbench of the per-sample select machinery.

The plush trace puts the segment-count/select fusions ~30-60x off VPU
roofline per execution (runlogs/round4/trace_plush.txt, occurrence-counted).
scripts/micro_select.py times re-formulations at plush block dims; this
phase runs it on the real chip at the three relevant tiers.  Runs after the
round4c queue (rechained ahead of round4e: the micro data gates the
S-minor integration work, the packed-permute A/B does not).

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4f.py \
              > runlogs/round4f/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4b import other_queue_running  # noqa: E402
from queue_runner import RUNLOGS, Queue  # noqa: E402


def queue_finished(name):
    """True once a queue's log carries its terminal marker.  Unlike the
    pidfile check, this cannot race with a chained queue that has not
    CREATED its pidfile yet (two queues on the TPU at once was the round-3
    failure mode)."""
    try:
        log = open(os.path.join(RUNLOGS, name, "queue.log")).read()
    except OSError:
        return False
    return f"## QUEUE {name} DONE" in log or f"## QUEUE {name} ABORT" in log


def main():
    while not queue_finished("round4c"):
        time.sleep(120)
    while any(other_queue_running(q) for q in
              ("round4", "round4b", "round4c")):
        time.sleep(120)

    q = Queue("round4f", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "90")))
    base = ["python", "scripts/micro_select.py", "--reps", "20"]
    q.leg("micro plush S320", {}, base + ["--s", "320", "--k", "128"])
    q.leg("micro plush S1280", {}, base + ["--s", "1280", "--k", "128"])
    q.leg("micro grass S256", {}, base + ["--s", "256", "--k", "96"])
    q.done()


if __name__ == "__main__":
    main()
