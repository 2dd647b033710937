"""Round-4 phase E: packed occupancy-permute A/B (docs/PERF.md §2.13).

The round-4 carpet trace (runlogs/round4/trace_carpet.txt) attributed ~13%
of the frame to the occupancy sort's per-table row permutes — ~20 separate
gathers whose cost is per-row overhead, five of them 3-wide planes padding
to full 128-lane tiles.  device._permute_rows_packed packs them into one
gather per dtype group (bit-exact, test-pinned by
tests/test_sorted_render.py::test_packed_permute_bitexact).

Legs: ON/OFF pairs per scene at shipped defaults (the ON legs also verify
the committed goldens, proving full-scale exactness), then bench.py with
the new default.  Waits for the round4/round4b/round4c queues.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4e.py \
              > runlogs/round4e/nohup.out 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH  # noqa: E402
from ab_round4b import other_queue_running  # noqa: E402
from ab_round4f import queue_finished  # noqa: E402
from queue_runner import Queue  # noqa: E402

CARPET = CARPET_S + ["--tri-cull", "512"]  # the adopted round-4 tier


def main():
    while not queue_finished("round4f2"):
        time.sleep(120)
    while (other_queue_running("round4") or other_queue_running("round4b")
           or other_queue_running("round4c") or other_queue_running("round4f")
           or other_queue_running("round4f2")):
        time.sleep(120)

    q = Queue("round4e", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "150")))
    for name, cmd in (("carpet", CARPET), ("grass", GRASS), ("plush", PLUSH)):
        to = 2400 if name == "plush" else 1700
        q.leg(f"{name} packed-permute ON", {}, cmd, timeout=to)
        q.leg(f"{name} packed-permute OFF", {"NERFTEX_PACKED_PERMUTE": "0"},
              cmd, timeout=to)
    q.leg("bench packed-permute", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
