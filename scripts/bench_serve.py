"""Serve-path latency bench (VERDICT r4 next #7).

End-to-end RenderSession.render() wall time — host pose in, numpy RGBA
back — which is what an interactive client of the HTTP frontend sees.
Unlike bench_scene.py (device-staged inputs, block_until_ready on the
device output) this includes pose staging, the device round-trip for the
frame, and the host un-premultiply, i.e. the serving floor.

Usage:
  PYTHONPATH=$PWD:$PYTHONPATH python scripts/bench_serve.py carpet \
      [--op none|auto|<scene>] [--frames 5] [--height N] [--width N]
"""

import argparse
import importlib
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", help="config stem, e.g. carpet / grass / plush")
    ap.add_argument("--op", default="auto",
                    help="'auto' (adopted point for the scene), 'none' "
                         "(raw config — the pre-round-5 serve behavior), "
                         "or an explicit scene stem")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    args = ap.parse_args()

    import numpy as np

    from nerftex_tpu.render.serve import RenderSession
    from nerftex_tpu import operating_points

    config = importlib.import_module(f"configs.config_{args.scene}_render").config
    op = None
    if args.op == "auto":
        op = operating_points.resolve(args.scene)
    elif args.op != "none":
        op = args.op

    t0 = time.perf_counter()
    session = RenderSession(config, height=args.height, width=args.width,
                            operating_point=op)
    print(f"session up in {time.perf_counter() - t0:.1f}s "
          f"(op={'adopted' if op else 'raw config'}, "
          f"{session.height}x{session.width})", flush=True)

    # Orbit poses: every frame is a new pose through the same compiled
    # program, as an interactive client would produce.
    poses = [
        [float(np.cos(a)) * 0.6, float(np.sin(a)) * 0.6, 0.55]
        for a in np.linspace(0.3, 2.0, args.frames + 1)
    ]

    t0 = time.perf_counter()
    img = session.render(poses[0])
    print(f"first frame (incl compile): {time.perf_counter() - t0:.1f}s", flush=True)

    n_rays = session.height * session.width
    best = float("inf")
    for pose in poses[1:]:
        t0 = time.perf_counter()
        img = session.render(pose)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"frame: {dt * 1e3:.0f} ms -> {n_rays / dt:.0f} rays/s", flush=True)

    a = img[..., 3]
    print(f"best: {best * 1e3:.1f} ms/frame -> {n_rays / best:.0f} rays/s | "
          f"alpha mean {a.mean():.3f} frac>0.1 {(a > 0.1).mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
