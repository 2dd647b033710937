"""Round-4 phase C: tri-cull tier refinement + bench.py adoption A/B.

Phase-A's sweep (runlogs/round4/queue.log) measured tri512 at +11.4% over
tri0 with monotone decline above it (512 > 1024 > 2048); this phase probes
below the winner (256, 384) on the same sorted-grid harness, and A/Bs the
adopted default on bench.py itself (driver metric harness;
NERFTEX_BENCH_TRI_CULL=0 is the control).

Waits for the round4b train queue.  Run via:
  cd /root/repo && setsid nohup python -u scripts/ab_round4c.py \
      > runlogs/round4c/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4b import other_queue_running  # noqa: E402
from queue_runner import Queue  # noqa: E402

CARPET_S = ["python", "scripts/bench_scene.py", "carpet", "--block", "1024",
            "--max-hits", "48", "--step-cap", "320", "--cull", "448"]


def main():
    while other_queue_running("round4") or other_queue_running("round4b"):
        time.sleep(120)

    q = Queue("round4c", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "150")))
    q.leg("CARPETS tri256", {}, CARPET_S + ["--tri-cull", "256"])
    q.leg("CARPETS tri384", {}, CARPET_S + ["--tri-cull", "384"])
    q.leg("CARPETS tri512 recheck", {}, CARPET_S + ["--tri-cull", "512"])
    q.leg("bench tri512", {}, ["python", "bench.py"])
    q.leg("bench tri0 control", {"NERFTEX_BENCH_TRI_CULL": "0"},
          ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
