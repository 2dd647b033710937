"""Serving: a persistent render session + a minimal HTTP frontend.

The reference has no serving story (renders are batch jobs through the
Logger).  For production deployment this module keeps a trained model,
compiled render programs and the device scene resident across requests:

  - `RenderSession`: programmatic API — load a render config (the same dict
    the CLI uses), restore the checkpoint once, then `render(camera_pos,
    parameters, ...) -> RGBA` at interactive rates (compiled once per
    resolution).
  - `python -m nerftex_tpu.render.serve <config> --port 8000`: stdlib HTTP
    wrapper; POST /render with JSON {"camera_pos": [x,y,z], "parameters":
    [...], "radius": r} returns a PNG.  GET /healthz for liveness.
"""

import importlib
import json
import sys

import numpy as np

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict


class RenderSession:
    """Checkpoint-resident instanced renderer answering pose/param queries."""

    def __init__(
        self,
        config: dict,
        height: int = None,
        width: int = None,
        warmup: bool = False,
        render_chunk: int = None,
        operating_point=None,
    ):
        """render_chunk: rays per device dispatch; defaults to the whole
        frame (one fused program — the config's small training-era chunks
        cost a round-trip per chunk over the device tunnel).

        operating_point: None (raw config, the pre-round-5 behavior), a
        scene stem ('carpet'/'grass'/'plush', resolved through
        nerftex_tpu.operating_points), or a dict with the same shape as an
        OPERATING_POINTS entry.  Serving at the adopted point closed the
        ~2x RenderSession-vs-bench gap (VERDICT r4 next #7): the raw
        configs carry reference-parity render settings, not the measured
        TPU blocking/cull/bf16 knobs."""
        from nerftex_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

        config = EasyDict(config)
        rng.set_seed(config.get("seed"))

        if isinstance(operating_point, str):
            from nerftex_tpu import operating_points

            resolved = operating_points.resolve(operating_point)
            if resolved is None:
                raise ValueError(
                    f"no adopted operating point for scene {operating_point!r}"
                )
            operating_point = resolved
        self.operating_point = operating_point

        loader = config.test_dataset_config.data_loader_config
        self.height = height or loader.get("height", 512)
        self.width = width or loader.get("width", 512)
        self.angle = loader.get("angle", 0.63)
        self.default_radius = loader.get("radius", 5.0)
        if isinstance(self.default_radius, dict):
            self.default_radius = 5.0
        self.default_parameters = None
        pdist = util.instantiate(EasyDict(loader["parameter_dist_config"]))
        self.default_parameters = np.asarray(pdist(), np.float32)

        proxy_cfg = config.test_dataset_config.proxy_config
        self.proxy = util.instantiate(EasyDict(proxy_cfg))

        model_config = EasyDict(config.model_config)
        model_config.setdefault("n_parameters", len(self.default_parameters))
        renderer_config = EasyDict(config.renderer_config)
        if operating_point:
            model_config["compute_dtype"] = operating_point.get(
                "compute_dtype", model_config.get("compute_dtype", "float32"))
            renderer_config.update(operating_point.get("renderer", {}))
            renderer_config.instancer_config = EasyDict(
                renderer_config.instancer_config)
            renderer_config.instancer_config.update(
                operating_point.get("instancer", {}))
        self.models = util.instantiate(model_config)

        renderer_config.update(self.models)
        self.renderer = util.instantiate(renderer_config)
        self.renderer.render_chunk = render_chunk or self.height * self.width
        self._raygen_cache = {}

        # Restore the latest checkpoint (model weights only, like
        # render-mode Logger, logger.py:37).
        from nerftex_tpu.render.checkpoint import CheckpointManager
        import os

        source = config.get("source_path") or config.target_path
        manager = CheckpointManager(os.path.join(source, "checkpoints"))
        saved = manager.restore_latest()
        if saved:
            for name, model in self.models.items():
                if name in saved.get("models", {}):
                    model.params = saved["models"][name]
        else:
            # Serving random-init weights is almost never intended, and the
            # init draws from the GLOBAL numpy stream — a second session in
            # the same process renders a *different* random frame, which
            # reads as nondeterminism in A/B comparisons.
            print(
                f"WARNING: RenderSession found no checkpoint under "
                f"{os.path.join(source, 'checkpoints')!r}; serving "
                f"random-init weights.",
                flush=True,
            )
        self.restored_from = manager.latest_checkpoint

        self._focal = self.width / np.tan(self.angle / 2) / 2
        self._frame = 0
        if warmup:
            self.render([0.47, -0.65, 0.6])
            self._frame = 0

    def render(self, camera_pos, parameters=None, radius=None, look_at=(0, 0, 0.0)):
        """camera_pos: unit-ish direction or absolute position (scaled by
        radius when given).  Returns float32 [H, W, 4] straight-alpha RGBA."""
        from nerftex_tpu.data.dataset import look_at_np

        pos = np.asarray(camera_pos, np.float64)
        if radius is not None:
            pos = pos * radius
        elif np.linalg.norm(pos) < 2.0:
            pos = pos * self.default_radius
        pose = look_at_np(pos, to=np.asarray(look_at, np.float64))

        if parameters is None:
            parameters = self.default_parameters
        parameters = np.asarray(parameters, np.float32)

        h, w = self.height, self.width
        # Per-frame host->device traffic is just the 4x4 pose + parameters:
        # pixel rays, normalization and the proxy slab test run on device
        # (the tunnel's per-frame transfer of ~9 MB of ray arrays dominated
        # serving latency before).
        rays_o, rays_d, t, cone = self._device_rays(pose)

        self._frame += 1
        out = self.renderer(
            rays_o=rays_o[None],
            rays_d=rays_d[None],
            t=t[None],
            parameters=parameters[None],
            cone_scale=cone[None],
            training=False,
        )
        img = np.concatenate(
            [
                np.asarray(out["color_pred"]).reshape(-1, 3),
                np.asarray(out["alpha_pred"]).reshape(-1, 1),
            ],
            -1,
        ).reshape(h, w, 4)
        img[..., :3] = img[..., :3] / (img[..., 3:] + 1e-5)
        return np.clip(img, 0, 1)

    def _device_rays(self, pose):
        """Whole-frame pixel rays + proxy intersection as one cached device
        program of the pose (ops/rays.rays_from_camera + the jnp AABB)."""
        import jax
        import jax.numpy as jnp

        from nerftex_tpu.ops.rays import rays_from_camera

        h, w = self.height, self.width
        if (h, w) not in self._raygen_cache:
            idx = np.arange(h * w)
            loc = jnp.asarray(np.stack([idx // w, idx % w], -1), jnp.float32)
            focal = self._focal
            proxy = self.proxy

            @jax.jit
            def gen(pose):
                rays_o, rays_d, cone = rays_from_camera(loc, h, w, focal, pose)
                rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
                t = proxy(rays_o, rays_d)
                return rays_o, rays_d, t, cone

            self._raygen_cache[(h, w)] = gen
        return self._raygen_cache[(h, w)](jnp.asarray(pose, jnp.float32))


# ---------------------------------------------------------------------------
# HTTP frontend (stdlib only)
# ---------------------------------------------------------------------------


def make_handler(session: RenderSession):
    from http.server import BaseHTTPRequestHandler

    from nerftex_tpu.utils.image import encode_png

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps(
                    {
                        "status": "ok",
                        "checkpoint": session.restored_from,
                        "resolution": [session.height, session.width],
                        "frames_served": session._frame,
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/render":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                img = session.render(
                    req.get("camera_pos", [0.47, -0.65, 0.6]),
                    parameters=req.get("parameters"),
                    radius=req.get("radius"),
                    look_at=req.get("look_at", (0, 0, 0.0)),
                )
            except Exception as e:  # surface errors as 400s with a message
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            png = encode_png(img)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return Handler


def main():
    import argparse
    import os
    from http.server import HTTPServer

    ap = argparse.ArgumentParser(description="Serve instanced renders over HTTP.")
    ap.add_argument("config", help="render config path (e.g. configs/config_carpet_render.py)")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the compile-warming render at startup")
    ap.add_argument(
        "--op", default="auto",
        help="render operating point: 'auto' (infer scene from the config "
             "name, fall back to raw config), 'none' (raw config), or a "
             "scene stem from nerftex_tpu.operating_points")
    args = ap.parse_args()

    if os.getcwd() not in sys.path:
        sys.path.insert(0, os.getcwd())
    config_path = args.config[:-3] if args.config.endswith(".py") else args.config
    config = importlib.import_module(config_path.replace("/", ".")).config

    from nerftex_tpu import operating_points

    if args.op == "auto":
        scene = operating_points.infer_scene(args.config)
        op = operating_points.resolve(scene) if scene else None
        print(f"operating point: {scene if op else 'raw config'}")
    elif args.op == "none":
        op = None
    else:
        op = args.op  # scene stem; RenderSession raises if unknown

    session = RenderSession(
        config, height=args.height, width=args.width,
        warmup=not args.no_warmup, operating_point=op,
    )
    print(f"restored: {session.restored_from}")
    server = HTTPServer(("127.0.0.1", args.port), make_handler(session))
    print(f"serving on http://127.0.0.1:{args.port} (/render, /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
