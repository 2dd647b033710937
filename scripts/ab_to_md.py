"""Turn the round-3 A/B leg logs into markdown tables for docs/PERF.md.

The phase scripts (scripts/ab_round3*.sh) append per-leg blocks of the form

    === <TAG> (attempt N, HH:MM:SS) ===
    ... bench stdout ...
    --- exit RC (HH:MM:SS) ---

to their log.  For every tag this script keeps the LAST attempt that exited
0, pulls the throughput number out of its stdout (``best: ...s -> N rays/s``
from bench_scene/bench_render, or the ``{"metric": ...}`` JSON line from
bench.py), and prints one markdown table per scene with the delta of each
variant against the previous one — the same-session A/B convention used
throughout docs/PERF.md.

Usage: python scripts/ab_to_md.py /tmp/ab_packed.log [/tmp/ab_round3b.log ...]
"""

import json
import re
import sys

HEADER = re.compile(r"^=== (.+) \(attempt \d+, ([0-9:]+)\) ===$")
FOOTER = re.compile(r"^--- exit (\d+) \(([0-9:]+)\) ---$")
BEST = re.compile(r"^best: [\d.]+s -> (\d+) rays/s")


def parse(path):
    """{tag: (rays_per_s, time_of_day)} for the last exit-0 block per tag."""
    results = {}
    tag = None
    block = []
    for line in open(path, errors="replace"):
        m = HEADER.match(line)
        if m:
            tag, block = m.group(1), []
            continue
        m = FOOTER.match(line)
        if m and tag is not None:
            if m.group(1) == "0":
                rays = None
                for bl in block:
                    mb = BEST.match(bl)
                    if mb:
                        rays = float(mb.group(1))
                    elif bl.startswith("{") and '"metric"' in bl:
                        rays = float(json.loads(bl)["value"])
                if rays is not None:
                    results[tag] = (rays, m.group(2))
            tag = None
            continue
        if tag is not None:
            block.append(line.rstrip("\n"))
    return results


def main(paths):
    results = {}
    for p in paths:
        results.update(parse(p))

    scenes = {}
    for tag, (rays, t) in results.items():
        parts = tag.split(None, 1)
        scene = parts[0]
        variant = parts[1] if len(parts) > 1 else tag
        scenes.setdefault(scene, []).append((variant, rays, t))

    for scene, rows in scenes.items():
        print(f"\n### {scene}\n")
        print("| variant | rays/s | vs prev | measured at |")
        print("|---|---:|---:|---|")
        prev = None
        for variant, rays, t in rows:  # log order = chain order
            delta = "" if prev is None else f"{(rays / prev - 1) * 100:+.1f}%"
            print(f"| {variant} | {rays:,.0f} | {delta} | {t} |")
            prev = rays
    missing_note(results)


def missing_note(results):
    expected = [
        f"{s} {v}"
        for s in ("PLUSH", "GRASS", "CARPET")
        for v in ("base", "packed", "topk", "cumsum")
    ]
    missing = [t for t in expected if t not in results]
    if missing:
        print(f"\nMissing phase-A legs: {', '.join(missing)}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/ab_packed.log"])
