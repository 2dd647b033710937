"""Phase D of the round-3 queue: gap-fill any phase-A A/B legs that never
succeeded (the TPU service was down for hours mid-chain, so early legs can
exhaust their retries while later ones land).  Parses /tmp/ab_packed.log for
per-tag success (an attempt block that ended with exit 0), re-runs the
missing legs with the same retry discipline, and appends results to the same
log so the doc pass reads one file.

Run via: nohup python scripts/ab_round3d.py &  (waits for phase C first)
"""

import os
import re
import subprocess
import sys
import time

LOG = "/tmp/ab_packed.log"
REPO = "/root/repo"

PLUSH = ["python", "scripts/bench_scene.py", "plush", "--step-cap", "1280",
         "--max-hits", "128", "--cull", "384", "--tri-cull", "1024",
         "--shadow-cull", "768", "--shadow-tri-cull", "1536"]
GRASS = ["python", "scripts/bench_scene.py", "grass", "--step-cap", "1024",
         "--max-hits", "96", "--cull", "512", "--tri-cull", "1024",
         "--shadow-cull", "512", "--shadow-tri-cull", "2048"]
CARPET = ["python", "bench.py"]

VARIANTS = [
    ("base",   {"NERFTEX_PACKED_GATHER": "0", "NERFTEX_TOPK_SELECT": "0",
                "NERFTEX_EVENT_CUMSUM": "0"}),
    ("packed", {"NERFTEX_TOPK_SELECT": "0", "NERFTEX_EVENT_CUMSUM": "0"}),
    ("topk",   {"NERFTEX_EVENT_CUMSUM": "0"}),
    ("cumsum", {}),
]
SCENES = [("PLUSH", PLUSH), ("GRASS", GRASS), ("CARPET", CARPET)]


def succeeded_tags(path):
    """Tags whose most recent attempt block ended with exit 0."""
    ok = set()
    if not os.path.exists(path):
        return ok
    tag = None
    for line in open(path, errors="replace"):
        m = re.match(r"=== (.+) \(attempt \d+, [0-9:]+\) ===", line)
        if m:
            tag = m.group(1)
            continue
        if tag and re.match(r"--- exit 0 ", line):
            ok.add(tag)
    return ok


def wait_for(phase_script):
    while True:
        out = subprocess.run(
            ["pgrep", "-x", "-f", f"bash scripts/{phase_script}"],
            capture_output=True,
        )
        if out.returncode != 0:
            return
        time.sleep(60)


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def run_leg(tag, cmd, env_over, unavail):
    for attempt in range(1, 7):
        log(f"=== {tag} (attempt {attempt}, {time.strftime('%H:%M:%S')}) ===")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
        env.update(env_over)
        p = subprocess.run(
            ["timeout", "1700"] + cmd, cwd=REPO, env=env,
            capture_output=True, text=True,
        )
        body = p.stdout + p.stderr
        log(body)
        log(f"--- exit {p.returncode} ({time.strftime('%H:%M:%S')}) ---")
        if p.returncode == 0:
            return unavail, True
        if "Unable to initialize backend" not in body:
            return unavail, False
        unavail += 1
        if unavail >= 10:
            log(f"## PHASE-D ABORT: {unavail} backend-unavailable failures")
            sys.exit(2)
        time.sleep(240)
    return unavail, False


def main():
    # Queue behind the earlier phases (they hold the chip).
    for phase in ("ab_round3.sh", "ab_round3b.sh", "ab_round3c.sh"):
        wait_for(phase)

    done = succeeded_tags(LOG)
    missing = [
        (f"{sname} {vname}", cmd, env)
        for sname, cmd in SCENES
        for vname, env in VARIANTS
        if f"{sname} {vname}" not in done
    ]
    if not missing:
        log("## PHASE-D: no gaps")
        return
    log(f"## PHASE-D gap-fill: {[t for t, _, _ in missing]}")
    unavail = 0
    for tag, cmd, env in missing:
        unavail, ok = run_leg(tag, cmd, env, unavail)
    log("## PHASE-D DONE")


if __name__ == "__main__":
    main()
