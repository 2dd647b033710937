"""Phase G — carpet tri-cull sweep on the right harness.

The phase-B tri-cull legs used scripts/bench_render.py at chunk 262144;
that harness runs the COMPACT sample path, whose flat [B, 3]/[B, n_params]
interface arrays lane-pad 18-42x on TPU — at a 262k-ray chunk that is a
21.5 GB allocation and the compile OOMs (see /tmp/ab_round3b.log).  The
sweep belongs on the sorted-grid path anyway: bench_scene.py carpet at the
headline operating point (block 1024, max-hits 48, step-cap 320, cull 448),
i.e. the same program bench.py times.  Tri-culling is exact-by-branching,
so every leg also passes the committed golden check.

Waits for phase F (pid in /tmp/ab3f.pid) so TPU runs stay serialized.
Appends to /tmp/ab_round3g.log in the queue's block format for ab_to_md.

Run via: nohup python scripts/ab_round3g.py > /tmp/ab3g_nohup.out 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = "/root/repo"
G_LOG = "/tmp/ab_round3g.log"
CARPET_S = ["python", "scripts/bench_scene.py", "carpet", "--block", "1024",
            "--max-hits", "48", "--step-cap", "320", "--cull", "448"]

LEGS = [
    ("CARPETS tri0", {}, CARPET_S),
    ("CARPETS tri512", {}, CARPET_S + ["--tri-cull", "512"]),
    ("CARPETS tri1024", {}, CARPET_S + ["--tri-cull", "1024"]),
    ("CARPETS tri2048", {}, CARPET_S + ["--tri-cull", "2048"]),
]

UNAVAIL = 0
UNAVAIL_MAX = 12


def leg(tag, env_over, cmd):
    global UNAVAIL
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.update(env_over)
    for attempt in range(1, 5):
        stamp = time.strftime("%H:%M:%S")
        with open(G_LOG, "a") as f:
            f.write(f"=== {tag} (attempt {attempt}, {stamp}) ===\n")
        try:
            out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                                 text=True, timeout=1700)
            rc, text = out.returncode, out.stdout + out.stderr
        except subprocess.TimeoutExpired as e:
            rc = 124

            def _s(x):
                return x.decode(errors="replace") if isinstance(x, bytes) \
                    else (x or "")

            text = _s(e.stdout) + _s(e.stderr)
        with open(G_LOG, "a") as f:
            f.write(text)
            f.write(f"\n--- exit {rc} ({time.strftime('%H:%M:%S')}) ---\n")
        if rc == 0:
            return True
        if "Unable to initialize backend" not in text:
            return False
        UNAVAIL += 1
        if UNAVAIL >= UNAVAIL_MAX:
            sys.exit(2)
        time.sleep(240)
    return False


def phase_f_running():
    try:
        pid = int(open("/tmp/ab3f.pid").read().strip())
    except (OSError, ValueError):
        return False
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def main():
    while phase_f_running():
        time.sleep(120)
    print(f"phase G: {len(LEGS)} legs", flush=True)
    for tag, env_over, cmd in LEGS:
        leg(tag, env_over, cmd)
    print("phase G: done", flush=True)


if __name__ == "__main__":
    main()
