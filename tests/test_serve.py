"""Serving layer: RenderSession reuse + HTTP endpoint round trip."""

import copy
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from nerftex_tpu.utils import rng
from nerftex_tpu.tools import gen_assets


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    assets = str(tmp_path_factory.mktemp("meshes"))
    gen_assets.generate(assets, seed=0)
    rng.set_seed(0)
    import nerftex_tpu.models.mlp as mlp_mod

    mlp_mod._INIT_COUNTER[0] = 0

    from configs.config_carpet_render import config as full
    from nerftex_tpu.render.serve import RenderSession

    cfg = copy.deepcopy(full)
    cfg["target_path"] = str(tmp_path_factory.mktemp("logs"))  # no checkpoint
    inst = cfg["renderer_config"]["instancer_config"]
    inst.update(
        {
            "textures": [os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            "mesh_path": os.path.join(assets, "cloth_mesh.ply"),
            "patch_origins_path": os.path.join(assets, "cloth_anchor_points.ply"),
            "max_hits": 16,
            "ray_block": 64,
        }
    )
    cfg["renderer_config"].update({"render_chunk": 256, "n_samples": 128})
    cfg["model_config"].update({"depth": 2, "width": 32, "skips": [1]})
    return RenderSession(cfg, height=16, width=16)


def test_render_session_reuses_compilation(session):
    img1 = session.render([0.47, -0.65, 0.6])
    img2 = session.render([0.0, -0.7, 0.7])
    assert img1.shape == (16, 16, 4)
    assert np.isfinite(img1).all() and np.isfinite(img2).all()
    assert not np.allclose(img1, img2)  # different views differ
    assert session._frame == 2


def test_render_session_parameters_change_output(session):
    p1 = session.default_parameters.copy()
    p2 = p1.copy()
    p2[0] = 0.05  # much shorter fibres
    a1 = session.render([0.47, -0.65, 0.6], parameters=p1)[..., 3]
    a2 = session.render([0.47, -0.65, 0.6], parameters=p2)[..., 3]
    assert a1.shape == a2.shape
    # Untrained model: outputs may be similar; just require valid alpha.
    assert a1.max() <= 1 + 1e-5 and a2.max() <= 1 + 1e-5


def test_http_endpoint_roundtrip(session):
    from http.server import HTTPServer
    from nerftex_tpu.render.serve import make_handler

    server = HTTPServer(("127.0.0.1", 0), make_handler(session))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["resolution"] == [16, 16]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"camera_pos": [0.47, -0.65, 0.6]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            png = r.read()
        assert png[:4] == b"\x89PNG"
        from nerftex_tpu.utils.image import decode_png

        img = decode_png(png)
        assert img.shape == (16, 16, 4)

        # Malformed body -> clean 400 with an error message.
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=b'{"camera_pos": "nonsense"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        server.shutdown()


def test_operating_point_applied(tmp_path_factory):
    """RenderSession(operating_point=...) merges the adopted knobs into the
    instancer/renderer configs and the model compute dtype (VERDICT r4 next
    #7: serving at raw-config defaults measured ~2x slower than bench)."""
    from nerftex_tpu.tools import gen_assets as ga
    import nerftex_tpu.models.mlp as mlp_mod
    from configs.config_carpet_render import config as full
    from nerftex_tpu.render.serve import RenderSession

    assets = str(tmp_path_factory.mktemp("meshes"))
    ga.generate(assets, seed=0)
    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0

    cfg = copy.deepcopy(full)
    cfg["target_path"] = str(tmp_path_factory.mktemp("logs"))
    cfg["renderer_config"]["instancer_config"].update(
        {
            "textures": [os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
            "mesh_path": os.path.join(assets, "cloth_mesh.ply"),
            "patch_origins_path": os.path.join(assets, "cloth_anchor_points.ply"),
        }
    )
    cfg["renderer_config"].update({"n_samples": 128})
    cfg["model_config"].update({"depth": 2, "width": 32, "skips": [1]})

    op = {
        "compute_dtype": "bfloat16",
        "renderer": {"sorted_blocks": True},
        "instancer": {"ray_block": 64, "max_hits": 16, "max_steps_per_ray": 64},
    }
    s = RenderSession(cfg, height=16, width=16, operating_point=op)
    assert s.renderer.sorted_blocks is True
    assert s.renderer.instancer.device.max_hits == 16
    img = s.render([0.47, -0.65, 0.6])
    assert img.shape == (16, 16, 4)
    assert np.isfinite(img).all()

    with pytest.raises(ValueError, match="no adopted operating point"):
        RenderSession(cfg, height=16, width=16, operating_point="nonsense")


def test_operating_points_registry():
    from nerftex_tpu import operating_points as opp

    for scene in ("carpet", "grass", "plush", "carpet10k", "fur"):
        op = opp.resolve(scene)
        assert op and "instancer" in op, scene
    assert opp.resolve("nope") is None
    assert opp.infer_scene("configs/config_carpet_render.py") == "carpet"
    assert opp.infer_scene("configs.config_grass_filtered_render") == "grass_filtered"
    assert opp.infer_scene("weird.py") is None
