"""Round-4 TPU measurement queue (VERDICT r3 next #2/#5/#6).

Legs, in order:
  A. plush golden write + a verify pass of all three scenes against their
     committed goldens at shipped defaults (plush could never be checked
     before the divisor-safe _check_golden fix) — the verify legs double as
     fresh shipped-default throughput datapoints with SELECT_COEFS now ON.
  B. carpet tri-cull sweep on the sorted-grid harness (the program bench.py
     times) — the round-3 phase-G sweep that never got to run.
  C. xplane traces at the round-4 operating points (plush was never traced;
     carpet/grass re-traced with the §2.11 gates all ON), parsed to
     committed .txt summaries.
  D. a trailing bench.py control.

Runs through scripts/queue_runner.Queue: logs in runlogs/round4/, hard
deadline, kill file, pidfile for killall_queues.sh, deterministic failures
not retried.

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4.py \
              > runlogs/round4/nohup.out 2>&1 &
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_runner import REPO, Queue  # noqa: E402

CARPET_S = ["python", "scripts/bench_scene.py", "carpet", "--block", "1024",
            "--max-hits", "48", "--step-cap", "320", "--cull", "448"]
GRASS = ["python", "scripts/bench_scene.py", "grass", "--step-cap", "1024",
         "--max-hits", "96", "--cull", "512", "--tri-cull", "1024",
         "--shadow-cull", "512", "--shadow-tri-cull", "2048"]
PLUSH = ["python", "scripts/bench_scene.py", "plush", "--step-cap", "1280",
         "--max-hits", "128", "--cull", "384", "--tri-cull", "1024",
         "--shadow-cull", "768", "--shadow-tri-cull", "1536"]

TRACE_DIR = os.path.join(REPO, "runlogs", "round4")


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
    q._log(f"## trace {name}: parsed -> runlogs/round4/trace_{name}.txt")


def main():
    q = Queue("round4", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "300")))

    # A. goldens + verify at shipped defaults
    if not os.path.exists(f"{REPO}/tests/golden_scene_plush.npz"):
        q.leg("golden plush", {}, PLUSH + ["--trials", "1", "--write-golden"],
              timeout=2400)
    q.leg("verify plush", {}, PLUSH, timeout=2400)
    q.leg("verify carpet", {}, CARPET_S)
    q.leg("verify grass", {}, GRASS)

    # B. carpet tri-cull sweep (tri0 = the verify-carpet leg above)
    for tri in (512, 1024, 2048):
        q.leg(f"CARPETS tri{tri}", {}, CARPET_S + ["--tri-cull", str(tri)])

    # C. traces at round-4 defaults
    for name, cmd in (("carpet", CARPET_S), ("grass", GRASS),
                      ("plush", PLUSH)):
        to = 2400 if name == "plush" else 1700
        if q.leg(f"trace {name}", {},
                 cmd + ["--trials", "1", "--trace", f"{TRACE_DIR}/trace_{name}"],
                 timeout=to):
            parse_trace(q, name)

    # D. trailing control
    q.leg("final bench", {}, ["python", "bench.py"])
    q.done()


if __name__ == "__main__":
    main()
