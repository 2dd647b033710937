"""Phase F — finisher for the round-3 measurement queue.

Phases B/C skip themselves when an upstream phase aborted on the
backend-unavailable budget, which is correct for an unattended overnight
queue but wrong once the TPU service eventually returns: the queue would
end with legs permanently missing.  This script waits for every earlier
phase to exit, then re-runs ONLY what is still missing — phase-A A/B legs,
phase-B SELECT_COEFS/tri-cull/bench legs, phase-C traces, phase-E goldens —
appending to the same logs the doc pass reads (scripts/ab_to_md.py).

Ordering preserves the queue's invariants: A/B legs first (same-session
adjacency per scene), traces next, goldens last (they must not exist while
measurement legs run, or bench_scene would assert against them).

Run via: nohup python scripts/ab_round3f.py > /tmp/ab3f_nohup.out 2>&1 &
"""

import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_round3d import succeeded_tags  # noqa: E402

REPO = "/root/repo"
A_LOG = "/tmp/ab_packed.log"
B_LOG = "/tmp/ab_round3b.log"
C_LOG = "/tmp/ab_round3c.log"
E_LOG = "/tmp/ab_round3e.log"

UNAVAIL = 0
UNAVAIL_MAX = 30  # ~12.5 h of 25-min probe failures before giving up

PLUSH = ["python", "scripts/bench_scene.py", "plush", "--step-cap", "1280",
         "--max-hits", "128", "--cull", "384", "--tri-cull", "1024",
         "--shadow-cull", "768", "--shadow-tri-cull", "1536"]
GRASS = ["python", "scripts/bench_scene.py", "grass", "--step-cap", "1024",
         "--max-hits", "96", "--cull", "512", "--tri-cull", "1024",
         "--shadow-cull", "512", "--shadow-tri-cull", "2048"]
CARPET = ["python", "bench.py"]

GATES = ["NERFTEX_PACKED_GATHER", "NERFTEX_TOPK_SELECT",
         "NERFTEX_EVENT_CUMSUM", "NERFTEX_SELECT_COEFS"]

# (log, tag, env-overrides, cmd).  Run order below is CHEAPEST-AND-MOST-
# HEADLINE-CRITICAL FIRST (carpet = the driver metric, fast compiles;
# plush = 12-17 min compiles), so a late service return still lands the
# numbers that matter most.  Each scene's variant chain stays contiguous
# for same-session A/B adjacency.
_VARIANTS = (
    ("base", {"NERFTEX_PACKED_GATHER": "0", "NERFTEX_TOPK_SELECT": "0",
              "NERFTEX_EVENT_CUMSUM": "0"}),
    ("packed", {"NERFTEX_TOPK_SELECT": "0", "NERFTEX_EVENT_CUMSUM": "0"}),
    ("topk", {"NERFTEX_EVENT_CUMSUM": "0"}),
    ("cumsum", {}),
)


def _scene_legs(scene, cmd):
    legs = [(A_LOG, f"{scene} {var}", env, cmd) for var, env in _VARIANTS]
    legs.append((B_LOG, f"{scene} coefs", {"NERFTEX_SELECT_COEFS": "1"}, cmd))
    return legs


# The CARPET_R tri-cull legs (bench_render at chunk 262144) are gone: that
# harness runs the compact path whose lane-padded interface arrays OOM the
# compile at a 262k chunk — scripts/ab_round3g.py sweeps tri-cull on the
# sorted-grid harness instead (the program bench.py actually times).
PHASE_A = _scene_legs("CARPET", CARPET) + [
    (B_LOG, "CARPET final bench", {}, CARPET),
] + _scene_legs("GRASS", GRASS) + _scene_legs("PLUSH", PLUSH)
PHASE_B = []
PHASE_C = [
    (C_LOG, "trace carpet", {},
     ["python", "scripts/bench_scene.py", "carpet", "--block", "1024",
      "--max-hits", "48", "--step-cap", "320", "--cull", "448",
      "--trace", "/tmp/trace_r3_carpet"]),
    (C_LOG, "trace train", {},
     ["python", "scripts/bench_train.py", "--k", "50", "--reps", "2",
      "--dtype", "bfloat16", "--net-chunk", "16384", "--remat",
      "--trace", "/tmp/trace_r3_train"]),
    (C_LOG, "trace grass", {}, GRASS + ["--trace", "/tmp/trace_r3_grass"]),
    (C_LOG, "trace plush", {}, PLUSH + ["--trace", "/tmp/trace_r3_plush"]),
]
PHASE_E = [
    (E_LOG, "golden carpet", {},
     ["python", "scripts/bench_scene.py", "carpet", "--block", "1024",
      "--max-hits", "48", "--step-cap", "320", "--cull", "448",
      "--trials", "1", "--write-golden"]),
    (E_LOG, "golden grass", {}, GRASS + ["--trials", "1", "--write-golden"]),
    (E_LOG, "golden plush", {}, PLUSH + ["--trials", "1", "--write-golden"]),
]


def phases_running():
    pats = ["bash scripts/ab_round3.sh", "bash scripts/ab_round3b.sh",
            "bash scripts/ab_round3c.sh", "python scripts/ab_round3d.py",
            "bash scripts/ab_round3e.sh"]
    for p in pats:
        if subprocess.run(["pgrep", "-x", "-f", p],
                          capture_output=True).returncode == 0:
            return True
    return False


def leg(log, tag, env_over, cmd):
    """Retry-run one leg, appending blocks in the queue's log format."""
    global UNAVAIL
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.update(env_over)
    # Plush whole-frame compiles have measured 12-17 min after HLO changes;
    # give those legs headroom beyond the 25-min backend-init failure mode.
    leg_timeout = 2400 if "plush" in " ".join(cmd) else 1700
    for attempt in range(1, 7):
        stamp = time.strftime("%H:%M:%S")
        with open(log, "a") as f:
            f.write(f"=== {tag} (attempt {attempt}, {stamp}) ===\n")
        try:
            out = subprocess.run(
                cmd, cwd=REPO, env=env, capture_output=True, text=True,
                timeout=leg_timeout,
            )
            rc, text = out.returncode, out.stdout + out.stderr
        except subprocess.TimeoutExpired as e:
            rc = 124

            def _s(x):
                return x.decode(errors="replace") if isinstance(x, bytes) \
                    else (x or "")

            text = _s(e.stdout) + _s(e.stderr)
        with open(log, "a") as f:
            f.write(text)
            f.write(f"\n--- exit {rc} ({time.strftime('%H:%M:%S')}) ---\n")
        if rc == 0:
            return True
        if "Unable to initialize backend" not in text:
            return False  # real failure: surface it, don't churn retries
        UNAVAIL += 1
        if UNAVAIL >= UNAVAIL_MAX:
            with open(log, "a") as f:
                f.write(f"## PHASE-F ABORT: {UNAVAIL} backend-unavailable\n")
            sys.exit(2)
        time.sleep(240)
    return False


def main():
    while phases_running():
        time.sleep(120)

    done = {A_LOG: succeeded_tags(A_LOG), B_LOG: succeeded_tags(B_LOG)}
    todo = [t for t in PHASE_A + PHASE_B if t[1] not in done[t[0]]]
    todo += [t for t in PHASE_C
             if not os.path.exists(f"/tmp/{t[1].replace('trace ', 'trace_r3_')}.txt")]
    todo += [t for t in PHASE_E
             if not os.path.exists(
                 f"{REPO}/tests/golden_scene_{t[1].split()[-1]}.npz")]
    print(f"phase F: {len(todo)} missing legs: {[t[1] for t in todo]}",
          flush=True)

    for log, tag, env_over, cmd in todo:
        leg(log, tag, env_over, cmd)
        if tag.startswith("trace "):
            name = tag.split()[-1]
            pbs = subprocess.run(
                ["bash", "-c",
                 f"ls /tmp/trace_r3_{name}/plugins/profile/*/*.xplane.pb"
                 " 2>/dev/null | head -1"],
                capture_output=True, text=True).stdout.strip()
            if pbs:
                with open(f"/tmp/trace_r3_{name}.txt", "w") as f:
                    subprocess.run(
                        ["python", "scripts/parse_xplane.py", pbs, "self",
                         "25"], cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    print("phase F: done", flush=True)


if __name__ == "__main__":
    main()
