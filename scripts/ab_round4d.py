"""Round-4 phase-A finisher: the legs the VM restart killed.

The original round4 queue (scripts/ab_round4.py) completed phases A+B
(goldens, shipped-default verifies, carpet tri-cull sweep — all in
runlogs/round4/queue.log) but the box restarted during the first trace leg.
This finisher re-runs only what is missing: the three xplane traces at
round-4 shipped defaults (VERDICT r3 next #6) and the trailing bench.py
control.  It reuses the "round4" queue name so evidence stays appended to
the same queue.log.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4d.py \
              > runlogs/round4/nohup_finisher.out 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH, TRACE_DIR, parse_trace  # noqa: E402
from queue_runner import Queue  # noqa: E402


def main():
    q = Queue("round4", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "120")))
    for name, cmd in (("carpet", CARPET_S), ("grass", GRASS), ("plush", PLUSH)):
        to = 2400 if name == "plush" else 1700
        if q.leg(f"trace {name}", {},
                 cmd + ["--trials", "1", "--trace", f"{TRACE_DIR}/trace_{name}"],
                 timeout=to):
            parse_trace(q, name)
    q.leg("final bench", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
