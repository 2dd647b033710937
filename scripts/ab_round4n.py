"""Round-4 phase N: next-heavy micros + save_encodings train A/B.

Driven by the round-4m traces at the final §2.16 defaults:
  1. micro_select group 7 — sel_k overlap-resolution chain re-formulations
     at plush dims (convert_reduce family still 488 ms = 19% of the plush
     frame; barrier-split / chunked-K streaming / cost-structure probes).
  2. micro_texgather — the quad-packed bilinear texture gather family
     (56 ms = 15.6% of the carpet frame, ~200x off HBM roofline).
  3. bench_train: remat control vs remat=save_encodings at the shipped
     best operating point (PERF §1.4 named the sine_convert family ~10%
     of the step; the policy keeps encoder outputs saved in backward).

Run via:  cd /root/repo && setsid nohup python -u scripts/ab_round4n.py \
              > runlogs/round4n/nohup.out 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_runner import Queue  # noqa: E402

MICRO_SEL = ["python", "scripts/micro_select.py", "--reps", "20"]
MICRO_TEX = ["python", "scripts/micro_texgather.py", "--reps", "20"]
TRAIN = ["python", "scripts/bench_train.py", "--k", "50", "--reps", "2",
         "--dtype", "bfloat16", "--net-chunk", "16384"]


def main():
    q = Queue("round4n", deadline_min=int(os.environ.get("Q_DEADLINE_MIN", "150")))
    q.leg("selk micro plush dims", {},
          MICRO_SEL + ["--rb", "2048", "--s", "320", "--k", "128",
                       "--groups", "7"], timeout=2400)
    q.leg("selk micro grass dims", {},
          MICRO_SEL + ["--rb", "2048", "--s", "256", "--k", "96",
                       "--groups", "7"], timeout=2400)
    q.leg("texgather micro carpet dims", {},
          MICRO_TEX + ["--rb", "1024", "--s", "320"], timeout=2400)
    q.leg("train control remat", {}, TRAIN + ["--remat"], timeout=2400)
    q.leg("train save_encodings", {},
          TRAIN + ["--remat", "save_encodings"], timeout=2400)
    q.done()


if __name__ == "__main__":
    main()
