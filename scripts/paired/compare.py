"""Compare the paired renders: reference (TF/CPU) vs this framework.

Reads logs/paired_ref/test_renders/test_*.npz and every
logs/paired_ours*/test_renders/ directory (multiple seeds = the framework's
run-to-run band), reports per-image and mean PSNR vs ground truth plus the
cross-framework pixel PSNR, as a markdown table for BASELINE.md.
"""

import glob
import importlib.util
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location("paired_common", os.path.join(_HERE, "common.py"))
common = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(common)


def load_dir(d):
    out = []
    for p in sorted(glob.glob(os.path.join(d, "test_*.npz"))):
        out.append(dict(np.load(p)))
    return out


def mean_psnr(renders, key="color", gt_key="gt_color"):
    return [common.psnr(r[key], r[gt_key]) for r in renders]


def main():
    ref_dir = os.path.join(common.REPO, "logs", "paired_ref", "test_renders")
    ref = load_dir(ref_dir)
    assert ref, f"no reference renders in {ref_dir} (is run_reference.py done?)"

    ours_dirs = sorted(
        d
        for d in glob.glob(os.path.join(common.REPO, "logs", "paired_ours*"))
        if os.path.isdir(os.path.join(d, "test_renders"))
    )
    ours_sets = {os.path.basename(d): load_dir(os.path.join(d, "test_renders")) for d in ours_dirs}

    ref_psnrs = mean_psnr(ref)
    print(f"reference vs GT:  per-image {[f'{p:.2f}' for p in ref_psnrs]}")
    print(f"reference vs GT:  mean {np.mean(ref_psnrs):.2f} dB")

    means = []
    for name, renders in ours_sets.items():
        ps = mean_psnr(renders)
        means.append(np.mean(ps))
        cross = [common.psnr(a["color"], b["color"]) for a, b in zip(renders, ref)]
        print(
            f"{name}: vs GT mean {np.mean(ps):.2f} dB "
            f"(per-image {[f'{p:.2f}' for p in ps]}); vs reference render "
            f"mean {np.mean(cross):.2f} dB"
        )

    means = np.array(means)
    print(
        f"\nframework band over {len(means)} seeds: "
        f"{means.mean():.2f} ± {means.std():.2f} dB "
        f"(min {means.min():.2f}, max {means.max():.2f})"
    )
    gap = np.mean(ref_psnrs) - means.mean()
    print(f"reference-minus-framework mean gap: {gap:+.2f} dB")
    inside = means.min() - means.std() <= np.mean(ref_psnrs) <= means.max() + means.std()
    print(f"reference inside the framework seed band: {inside}")


if __name__ == "__main__":
    main()
