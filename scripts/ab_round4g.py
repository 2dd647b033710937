"""Round-4 phase G: tri-cull tier refinement round 2 + grass/plush probes.

Phase C measured carpet tri384 at 564.8k rays/s vs tri512's 522.2k recheck
(+8%) — the optimum sits near 384, so probe 320/448 and A/B bench.py at
384-vs-512 to re-decide the shipped default.  Grass/plush ship primary
--tri-cull 1024 that was never swept below; probe 512/768 on each (exact at
any budget — only speed changes; goldens assert it).

Waits for every earlier round-4 queue.  Run via:
  cd /root/repo && setsid nohup python -u scripts/ab_round4g.py \
      > runlogs/round4g/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH  # noqa: E402
from ab_round4b import other_queue_running  # noqa: E402
from ab_round4f import queue_finished  # noqa: E402
from queue_runner import Queue  # noqa: E402


def swap_tri(cmd, budget):
    cmd = list(cmd)
    i = cmd.index("--tri-cull")
    cmd[i + 1] = str(budget)
    return cmd


def main():
    while not queue_finished("round4e"):
        time.sleep(120)
    while any(other_queue_running(q) for q in
              ("round4", "round4b", "round4c", "round4e", "round4f")):
        time.sleep(120)

    q = Queue("round4g", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "150")))
    for tri in (320, 448, 384):
        q.leg(f"CARPETS tri{tri}", {}, CARPET_S + ["--tri-cull", str(tri)])
    q.leg("bench tri384", {"NERFTEX_BENCH_TRI_CULL": "384"}, ["python", "bench.py"])
    q.leg("bench tri512 control", {"NERFTEX_BENCH_TRI_CULL": "512"},
          ["python", "bench.py"])
    for tri in (768, 512):
        q.leg(f"GRASS tri{tri}", {}, swap_tri(GRASS, tri))
    for tri in (768, 512):
        q.leg(f"PLUSH tri{tri}", {}, swap_tri(PLUSH, tri), timeout=2400)
    q.done()


if __name__ == "__main__":
    main()
