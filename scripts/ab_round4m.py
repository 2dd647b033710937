"""Round-4 phase M: re-trace at the post-§2.16 shipped defaults.

§2.16 flipped NERFTEX_EVENT_RELAYOUT + NERFTEX_INTERVAL_PICK default ON
(runlogs/round4l in-frame A/B: plush +2.2%, grass/carpet neutral-positive).
The round4k traces predate that flip, so the committed attribution no
longer describes the shipped hot path.  This phase re-captures the three
scene traces with every gate at its final default, parses them to
committed .txt summaries, and closes with a bench.py control — the data
that names the NEXT heavy (what remains of plush's convert_reduce
segment-count family, carpet's texture gathers/sorts).

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4m.py \
              > runlogs/round4m/nohup.out 2>&1 &
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round4 import CARPET_S, GRASS, PLUSH  # noqa: E402
from queue_runner import REPO, Queue  # noqa: E402

CARPET = CARPET_S + ["--tri-cull", "384"]
TRACE_DIR = os.path.join(REPO, "runlogs", "round4m")


def parse_trace(q, name):
    pb = subprocess.run(
        ["bash", "-c",
         f"ls {TRACE_DIR}/trace_{name}/plugins/profile/*/*.xplane.pb"
         " 2>/dev/null | head -1"],
        capture_output=True, text=True).stdout.strip()
    if not pb:
        q._log(f"## trace {name}: no xplane.pb found")
        return
    with open(f"{TRACE_DIR}/trace_{name}.txt", "w") as f:
        subprocess.run(["python", "scripts/parse_xplane.py", pb, "self", "25"],
                       cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    q._log(f"## trace {name}: parsed -> runlogs/round4m/trace_{name}.txt")


def main():
    q = Queue("round4m", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "120")))
    for name, cmd in (("carpet", CARPET), ("grass", GRASS), ("plush", PLUSH)):
        to = 2400 if name == "plush" else 1700
        if q.leg(f"trace {name}", {},
                 cmd + ["--trials", "1", "--trace", f"{TRACE_DIR}/trace_{name}"],
                 timeout=to):
            parse_trace(q, name)
    q.leg("final bench", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
