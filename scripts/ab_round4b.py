"""Round-4 phase B: flat-parameter train-step A/B (docs/PERF.md §1.4).

Measures the single-chip fused train step at the shipped best operating
point (bf16 + remat + net_chunk 16384) with and without
apply_flat_param_space, plus a chunk-size mini-sweep under flat (smaller
chunks pay more per-leaf accumulate overhead, so flat may move the optimum)
and an xplane trace of the winner.

Waits for the round4 render queue's pidfile so TPU runs stay serialized.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4b.py \
              > runlogs/round4b/nohup.out 2>&1 &
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_runner import REPO, RUNLOGS, Queue  # noqa: E402

TRAIN = ["python", "scripts/bench_train.py", "--k", "50", "--reps", "2",
         "--dtype", "bfloat16", "--remat"]
TRACE_DIR = os.path.join(RUNLOGS, "round4b")


def other_queue_running(name):
    try:
        pid = int(open(os.path.join(RUNLOGS, name, "queue.pid")).read().strip())
    except (OSError, ValueError):
        return False
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def main():
    os.makedirs(TRACE_DIR, exist_ok=True)
    while other_queue_running("round4"):
        time.sleep(120)

    q = Queue("round4b", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "180")))
    q.leg("train control 16k", {}, TRAIN + ["--net-chunk", "16384"])
    q.leg("train flat 16k", {}, TRAIN + ["--net-chunk", "16384", "--flat-params"])
    q.leg("train flat 8k", {}, TRAIN + ["--net-chunk", "8192", "--flat-params"])
    q.leg("train flat 32k", {}, TRAIN + ["--net-chunk", "32768", "--flat-params"])
    if q.leg("trace train flat", {},
             TRAIN + ["--net-chunk", "16384", "--flat-params", "--reps", "1",
                      "--trace", f"{TRACE_DIR}/trace_train_flat"]):
        pb = subprocess.run(
            ["bash", "-c",
             f"ls {TRACE_DIR}/trace_train_flat/plugins/profile/*/*.xplane.pb"
             " 2>/dev/null | head -1"],
            capture_output=True, text=True).stdout.strip()
        if pb:
            with open(f"{TRACE_DIR}/trace_train_flat.txt", "w") as f:
                subprocess.run(
                    ["python", "scripts/parse_xplane.py", pb, "self", "25"],
                    cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
            q._log("## trace parsed -> runlogs/round4b/trace_train_flat.txt")
    q.done()


if __name__ == "__main__":
    main()
