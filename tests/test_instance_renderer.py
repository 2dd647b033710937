import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.models.mlp import Model
from nerftex_tpu.render.instance_renderer import InstanceRenderer, MipInstanceRenderer
from nerftex_tpu.instancing.instancer import Instancer
from nerftex_tpu.tools import gen_assets


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    out = tmp_path_factory.mktemp("meshes")
    gen_assets.generate(str(out), seed=0)
    return str(out)


def _constant_model(sigma=3.0, color_logit=0.0):
    def apply(params, pos, dirs, prms):
        n = pos.shape[0]
        color = jnp.full((n, 3), color_logit) + 0.0 * params["w"].sum()
        density = jnp.full((n, 1), sigma)
        return color, density

    return Model("model", {"w": jnp.zeros(1)}, apply)


def _single_box_instancer(**kwargs):
    inst = Instancer(
        b_0=[-0.5, -0.5, -0.5],
        b_1=[0.5, 0.5, 0.5],
        transformations=[np.eye(4, dtype=np.float32)],
        ray_block=8,
        max_hits=4,
        **kwargs,
    )
    return inst


def _ray_data(n=4, z=5.0, n_params=0):
    rs = np.random.RandomState(0)
    return {
        "rays_o": np.concatenate(
            [rs.uniform(-0.2, 0.2, (1, n, 2)), np.full((1, n, 1), z)], -1
        ).astype(np.float32),
        "rays_d": np.tile(np.array([0, 0, -1.0], np.float32), (1, n, 1)),
        "t": np.tile(np.array([3.0, 7.0], np.float32), (1, n, 1)),
        "parameters": np.zeros((1, n_params), np.float32),
        "cone_scale": np.full((1, n, 1), 0.005, np.float32),
    }


def test_instance_renderer_matches_manual_composite():
    """Constant-density box: renderer output == hand-rolled compositing of
    the instancer's samples (the reference's formulas, renderer.py:318-354)."""
    sigma = 3.0
    inst = _single_box_instancer()
    model = _constant_model(sigma=sigma)
    renderer = InstanceRenderer(
        instancer_config=inst, model=model, n_samples=32, step_size=0.05
    )

    data = _ray_data(4)
    out = renderer(**data, training=False, key=jax.random.key(0))
    color = np.asarray(out["color_pred"])[0]
    alpha = np.asarray(out["alpha_pred"])[0]

    # Manual: alpha = 1 - prod(1 - (1-exp(-sigma*dist))) over the samples.
    got = inst.get_model_input_dict(
        data["rays_o"][0], data["rays_d"][0], data["parameters"].repeat(4, 0), 32, 0.05,
        key=jax.random.fold_in(jax.random.key(0), 0),
    )
    dists = np.asarray(got["dists"])
    a = 1 - np.exp(-sigma * dists)
    trans = np.cumprod(1 - a + 1e-10, -1)
    expected_alpha = (a * np.concatenate([np.ones_like(trans[:, :1]), trans[:, :-1]], -1)).sum(-1)
    # Same RNG offsets are NOT guaranteed between the two calls; compare
    # within the analytic tolerance (alpha depends only weakly on offsets).
    np.testing.assert_allclose(alpha, expected_alpha, atol=0.02)
    np.testing.assert_allclose(color, np.tile(0.5 * alpha[:, None], (1, 3)), atol=0.02)


def test_instance_renderer_background_and_miss():
    inst = _single_box_instancer()
    model = _constant_model(sigma=0.0)  # transparent patches
    renderer = InstanceRenderer(
        instancer_config=inst, model=model, n_samples=16, step_size=0.1
    )

    data = _ray_data(2)
    data["rays_o"][0, 1, :2] = [3.0, 3.0]  # ray 1 misses the box entirely
    out = renderer(**data, training=False, composite_bkgd=True, bkgd_color=[1, 0, 0],
                   key=jax.random.key(1))
    c = np.asarray(out["color_pred"])[0]
    np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-4)  # transparent -> bkgd
    np.testing.assert_allclose(c[1], [1, 0, 0], atol=1e-4)  # miss -> bkgd


def test_compaction_matches_dense():
    inst = _single_box_instancer()
    model = _constant_model()
    from nerftex_tpu.render.renderer import Renderer

    def build(budget):
        return InstanceRenderer(
            instancer_config=inst, model=model, n_samples=32, net_chunk=64,
            step_size=0.05, sample_budget_per_ray=budget,
        )

    data = _ray_data(6)
    dense = build(0)(**data, training=False, key=jax.random.key(5))
    compact = build(24)(**data, training=False, key=jax.random.key(5))
    np.testing.assert_allclose(
        np.asarray(dense["color_pred"]), np.asarray(compact["color_pred"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dense["alpha_pred"]), np.asarray(compact["alpha_pred"]), atol=1e-5
    )


def test_instance_renderer_via_config(assets):
    """Full config path: instancer.instancer.Instancer + ParamNerf over the
    procedural cloth scene at a small resolution."""
    rng.set_seed(0)
    models = util.instantiate(
        EasyDict(
            {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "n_parameters": [1, 6],
                "depth": 2,
                "width": 32,
                "skips": [1],
            }
        )
    )
    renderer = util.instantiate(
        EasyDict(
            {
                "module": "network.renderer.InstanceRenderer",
                "n_samples": 128,
                "render_chunk": 64,
                "net_chunk": 4096,
                "step_size": 0.004,
                "density_reweighting": True,
                "instancer_config": {
                    "module": "instancer.instancer.Instancer",
                    "b_0": [-1.4, -1.2, -0.1],
                    "b_1": [1.2, 1.2, 1.8],
                    "cast_shadow_rays": False,
                    "textures": [os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
                    "mesh_path": os.path.join(assets, "cloth_mesh.ply"),
                    "patch_origins_path": os.path.join(assets, "cloth_anchor_points.ply"),
                    "patch_scale": 0.09,
                    "jitter_amount": 1.0,
                    "instance_sampling_method": "nearest",
                    "max_hits": 32,
                    "ray_block": 64,
                },
                **models,
            }
        )
    )

    from nerftex_tpu.data.dataset import look_at_np
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np
    from nerftex_tpu.ops.proxy import AABB

    h = w = 8
    focal = w / np.tan(0.55 / 2) / 2
    c2w = look_at_np(np.array([0.47, -0.65, 0.6]) * 6.0)
    idx = np.arange(h * w)
    loc = np.stack([idx // w, idx % w], -1).astype(np.float32)
    rays_o, rays_d, cone = rays_from_camera_np(loc, h, w, focal, c2w)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    proxy = AABB([-1.5, -1.5, -1.5], [1.5, 1.5, 1.5])
    t = proxy.intersect_np(rays_o, rays_d)

    out = renderer(
        rays_o=rays_o[None],
        rays_d=rays_d[None],
        t=t[None],
        parameters=np.array([[1, 1, 1, 0.1, 0, 0, 1.0]], np.float32),
        cone_scale=cone[None],
        training=False,
    )
    color = np.asarray(out["color_pred"])
    alpha = np.asarray(out["alpha_pred"])
    assert color.shape == (1, 64, 3)
    assert np.isfinite(color).all() and np.isfinite(alpha).all()
    assert alpha.max() > 0.01  # something rendered
    assert (alpha >= -1e-6).all() and (alpha <= 1 + 1e-5).all()


def test_false_color_uses_instance_palette():
    rng.set_seed(0)
    inst = _single_box_instancer()
    model = _constant_model(sigma=50.0)
    from nerftex_tpu.render.renderer import Renderer

    r = InstanceRenderer(
        instancer_config=inst, model=model, n_samples=16, step_size=0.05,
        false_color=True,
    )
    r.instance_color = jnp.asarray([[0.2, 0.4, 0.8]])

    data = _ray_data(2)
    out = r(**data, training=False, key=jax.random.key(0))
    c = np.asarray(out["color_pred"])[0]
    a = np.asarray(out["alpha_pred"])[0]
    # Dense medium: color converges to the instance palette color * alpha.
    np.testing.assert_allclose(c, np.broadcast_to(np.array([[0.2, 0.4, 0.8]]) * a[:, None], c.shape), atol=0.02)


def test_mip_instance_renderer_smoke():
    inst = _single_box_instancer()
    seen = {}

    def apply(params, pos, dirs, prms):
        seen["pos_dim"] = pos.shape[-1]
        n = pos.shape[0]
        return jnp.zeros((n, 3)) + 0.0 * params["w"].sum(), jnp.full((n, 1), 2.0)

    model = Model("model", {"w": jnp.zeros(1)}, apply)
    from nerftex_tpu.render.renderer import Renderer

    r = MipInstanceRenderer(
        instancer_config=inst, model=model, n_samples=16, step_size=0.05,
        blur_idx=0,
    )

    data = _ray_data(2, n_params=2)
    data["parameters"][:] = [0.5, 3.0]
    out = r(**data, training=False, key=jax.random.key(0))
    assert seen["pos_dim"] == 6  # [mean, cov]
    assert np.isfinite(np.asarray(out["color_pred"])).all()


def test_compact_matches_dense_with_textures_and_light(assets):
    """Cloth scene with texture + light params: compact == dense rendering."""
    rng.set_seed(0)
    import nerftex_tpu.models.mlp as mlp_mod

    mlp_mod._INIT_COUNTER[0] = 0
    models = util.instantiate(
        EasyDict(
            {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "n_parameters": [1, 6],
                "depth": 2,
                "width": 32,
                "skips": [1],
            }
        )
    )
    inst = Instancer(
        b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8], cast_shadow_rays=False,
        textures=[os.path.join(assets, "smooth_checkerboard.png"), "", "", "", "light"],
        mesh_path=os.path.join(assets, "cloth_mesh.ply"),
        patch_origins_path=os.path.join(assets, "cloth_anchor_points.ply"),
        patch_scale=0.09, jitter_amount=1.0, instance_sampling_method="nearest",
        max_hits=32, ray_block=32,
    )

    from nerftex_tpu.data.dataset import look_at_np
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np
    from nerftex_tpu.ops.proxy import AABB

    h = w = 8
    focal = w / np.tan(0.55 / 2) / 2
    c2w = look_at_np(np.array([0.47, -0.65, 0.6]) * 6.0)
    idx = np.arange(h * w)
    loc = np.stack([idx // w, idx % w], -1).astype(np.float32)
    rays_o, rays_d, cone = rays_from_camera_np(loc, h, w, focal, c2w)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = AABB([-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]).intersect_np(rays_o, rays_d)
    data = dict(
        rays_o=rays_o[None], rays_d=rays_d[None], t=t[None],
        parameters=np.array([[1, 1, 1, 0.1, 0, 0, 1.0]], np.float32),
        cone_scale=cone[None],
    )

    def build(budget):
        return InstanceRenderer(
            instancer_config=inst, model=models["model"], n_samples=128,
            render_chunk=64, net_chunk=4096, step_size=0.004,
            sample_budget_per_ray=budget,
        )

    dense = build(0)(**data, training=False, key=jax.random.key(3))
    compact = build(96)(**data, training=False, key=jax.random.key(3))
    np.testing.assert_allclose(
        np.asarray(dense["color_pred"]), np.asarray(compact["color_pred"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dense["alpha_pred"]), np.asarray(compact["alpha_pred"]), atol=2e-4
    )


def test_mip_compact_smoke():
    inst = _single_box_instancer()

    def apply(params, pos, dirs, prms):
        n = pos.shape[0]
        return jnp.zeros((n, 3)) + 0.0 * params["w"].sum(), jnp.full((n, 1), 2.0)

    model = Model("model", {"w": jnp.zeros(1)}, apply)
    r = MipInstanceRenderer(
        instancer_config=inst, model=model, n_samples=16, step_size=0.05,
        blur_idx=0, sample_budget_per_ray=16,
    )
    data = _ray_data(2, n_params=2)
    data["parameters"][:] = [0.5, 3.0]
    out = r(**data, training=False, key=jax.random.key(0))
    assert np.isfinite(np.asarray(out["color_pred"])).all()
    assert np.asarray(out["alpha_pred"]).max() > 0
