"""Generic data-driven TPU measurement queue (VERDICT r4 next #6).

One runner for every A/B queue: legs are DATA (a JSON or TOML spec file),
not a new ab_roundN.py script per experiment.  Execution goes through
scripts/queue_runner.Queue, so every run gets the hard deadline, the
runlogs/KILL kill file, a pidfile for scripts/killall_queues.sh, in-repo
logs under runlogs/<queue>/, and the no-retry-on-deterministic-failure
policy.  The 23 frozen ab_round3*/ab_round4* scripts remain only as
provenance for the committed round-3/4 evidence.

Spec format (JSON shown; .toml accepted, same keys):

    {
      "queue": "round5a",            // runlogs/<queue>/
      "deadline_min": 90,            // hard wall-clock budget
      "legs": [
        {"tag": "plush kernel", "preset": "plush",
         "env": {"NERFTEX_TEX_PALLAS": "1"}, "timeout": 1500},
        {"tag": "plush control", "preset": "plush"},
        {"tag": "bench", "cmd": ["python", "bench.py"], "repeat": 2},
        {"tag": "trace", "preset": "carpet", "args": ["--trace",
         "runlogs/round5a/trace_carpet"], "parse_trace": "carpet"}
      ]
    }

Leg keys: tag (required), then ONE of preset | cmd; optional env (dict of
overrides), args (extra argv appended to the preset/cmd), timeout (s),
repeat (int, tags get /1../N suffixes), parse_trace (name: after the leg,
parse the newest xplane.pb under the --trace dir into
runlogs/<queue>/trace_<name>.txt).

Presets are the SHIPPED-DEFAULT scene commands (the round-4 adopted
operating points — keep these in sync with BASELINE.md):

    bench    python bench.py                       (north-star carpet)
    carpet   bench_scene carpet 1024/48/320 cull 448
    grass    bench_scene grass  step 1024 hits 96 cull 512/1024 shadow 512/2048
    plush    bench_scene plush  step 1280 hits 128 cull 384/1024 shadow 768/1536

Run detached:
    cd /root/repo && setsid nohup python -u scripts/ab.py specs/<spec>.json \
        > runlogs/<queue>/nohup.out 2>&1 &
Summarize a finished queue log: python scripts/ab_to_md.py runlogs/<q>/queue.log
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_runner import REPO, Queue  # noqa: E402

sys.path.insert(0, REPO)  # nerftex_tpu.operating_points for the presets

def _scene_preset(scene):
    """bench_scene argv for a scene's ADOPTED operating point
    (nerftex_tpu/operating_points.py is the single source of truth —
    VERDICT r4 next #6/#7)."""
    from nerftex_tpu import operating_points

    flag = {"ray_block": "--block", "max_hits": "--max-hits",
            "max_steps_per_ray": "--step-cap", "cull_budget": "--cull",
            "tri_cull_budget": "--tri-cull",
            "shadow_cull_budget": "--shadow-cull",
            "shadow_tri_cull_budget": "--shadow-tri-cull",
            "pallas_selk": "--selk"}
    cmd = ["python", "scripts/bench_scene.py", scene]
    for k, v in operating_points.resolve(scene)["instancer"].items():
        cmd += [flag[k], str(v)]
    return cmd


PRESETS = {
    "bench": ["python", "bench.py"],
    "carpet": _scene_preset("carpet"),
    "carpet10k": _scene_preset("carpet10k"),
    "grass": _scene_preset("grass"),
    "plush": _scene_preset("plush"),
}
DEFAULT_TIMEOUTS = {"bench": 1200, "carpet": 1200, "carpet10k": 2400,
                    "grass": 1200, "plush": 1500}


def load_spec(path):
    with open(path, "rb") as f:
        if path.endswith(".toml"):
            import tomllib

            return tomllib.load(f)
        return json.load(f)


def leg_cmd(leg):
    if ("preset" in leg) == ("cmd" in leg):
        raise ValueError(f"leg {leg.get('tag')!r}: need exactly one of preset|cmd")
    cmd = PRESETS[leg["preset"]] if "preset" in leg else list(leg["cmd"])
    return cmd + [str(a) for a in leg.get("args", [])]


def parse_trace(q, name, trace_dir):
    """Parse the newest xplane.pb under trace_dir into the queue dir."""
    pb = subprocess.run(
        ["bash", "-c",
         f"ls -t {trace_dir}/plugins/profile/*/*.xplane.pb 2>/dev/null | head -1"],
        capture_output=True, text=True).stdout.strip()
    if not pb:
        q._log(f"## trace {name}: no xplane.pb under {trace_dir}")
        return
    out = os.path.join(q.dir, f"trace_{name}.txt")
    with open(out, "w") as f:
        subprocess.run(["python", "scripts/parse_xplane.py", pb, "self", "25"],
                       cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    q._log(f"## trace {name}: parsed -> {os.path.relpath(out, REPO)}")


def run_spec(spec, dry=False):
    legs = spec["legs"]
    for leg in legs:
        leg_cmd(leg)  # validate the whole plan before holding the TPU
    if dry:
        for leg in legs:
            for i in range(int(leg.get("repeat", 1))):
                print(f"{leg['tag']}{f'/{i + 1}' if leg.get('repeat') else ''}: "
                      f"env={leg.get('env', {})} cmd={' '.join(leg_cmd(leg))}")
        return 0
    q = Queue(spec["queue"],
              deadline_min=int(os.environ.get("Q_DEADLINE_MIN",
                                              spec.get("deadline_min", 120))))
    for leg in legs:
        cmd = leg_cmd(leg)
        timeout = leg.get("timeout") or DEFAULT_TIMEOUTS.get(
            leg.get("preset"), q.default_timeout)
        repeat = int(leg.get("repeat", 1))
        for i in range(repeat):
            tag = leg["tag"] + (f"/{i + 1}" if repeat > 1 else "")
            ok = q.leg(tag, dict(leg.get("env", {})), cmd, timeout=timeout)
            if ok and "parse_trace" in leg:
                try:
                    trace_dir = cmd[cmd.index("--trace") + 1]
                except ValueError:
                    q._log(f"## LEG {tag}: parse_trace set but no --trace arg")
                    continue
                parse_trace(q, leg["parse_trace"], os.path.join(REPO, trace_dir))
    q.done()
    return 0


def main(argv):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("spec", help="path to a .json or .toml legs spec")
    ap.add_argument("--dry", action="store_true", help="print the plan, run nothing")
    args = ap.parse_args(argv)
    return run_spec(load_spec(args.spec), dry=args.dry)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
