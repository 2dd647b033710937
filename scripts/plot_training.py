"""Plot a training run's loss curve from its scalars.jsonl.

Usage: python scripts/plot_training.py logs/carpet_full [--out docs/carpet_full_loss.png]
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--key", default="Loss")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    steps, vals = [], []
    with open(os.path.join(args.run_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if args.key in rec:
                steps.append(rec["step"])
                vals.append(rec[args.key])

    steps = np.asarray(steps)
    vals = np.asarray(vals)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.plot(steps, vals, lw=0.4, alpha=0.35, color="#1f77b4")
    if len(vals) > 200:  # smoothed overlay
        k = max(1, len(vals) // 200)
        sm = np.convolve(vals, np.ones(k) / k, mode="valid")
        ax.plot(steps[k - 1 :], sm, lw=1.6, color="#1f77b4", label=f"{args.key} (smoothed)")
        ax.legend()
    ax.set_xlabel("step")
    ax.set_ylabel(args.key)
    ax.set_yscale("log")
    ax.set_title(os.path.basename(os.path.normpath(args.run_dir)))
    ax.grid(alpha=0.25)
    out = args.out or os.path.join(args.run_dir, "loss_curve.png")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"{out}: {len(vals)} points, final {args.key} = {vals[-1]:.4g}")


if __name__ == "__main__":
    main()
