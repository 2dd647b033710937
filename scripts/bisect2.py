"""Bisect renderer-layer compile times (after per-process warmup)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nerftex_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

t0 = time.perf_counter()
jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.instancing.instancer import Instancer

rng.set_seed(0)

inst = Instancer(
    b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8], cast_shadow_rays=False,
    textures=["meshes/smooth_checkerboard.png", "", "", "", "light"],
    mesh_path="meshes/cloth_mesh.ply", patch_origins_path="meshes/cloth_anchor_points.ply",
    patch_scale=0.09, jitter_amount=1.0, instance_sampling_method="nearest",
    max_hits=64, ray_block=256)

rs = np.random.RandomState(0)
R = 2048
rays_o = np.concatenate([rs.uniform(-1, 1, (R, 2)), np.full((R, 1), 4.0)], -1).astype(np.float32)
rays_d = np.tile(np.array([0, 0, -1.0], np.float32), (R, 1))
params7 = np.tile(np.array([1, 1, 1, 0.1, 0, 0, 1.0], np.float32), (R, 1))

t0 = time.perf_counter()
out = inst.get_model_input_dict(rays_o, rays_d, params7, 1024, 0.002)
jax.block_until_ready(out["dists"])
print(f"instancer (R=2048,S=1024): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = inst.get_model_input_dict(rays_o, rays_d, params7, 1024, 0.002)
jax.block_until_ready(out["dists"])
print(f"instancer warm: {time.perf_counter()-t0:.2f}s", flush=True)

models = util.instantiate(EasyDict({
    "module": "network.model.ParamNerf",
    "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 10},
    "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
    "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
    "n_parameters": [1, 6]}))

from nerftex_tpu.render.instance_renderer import InstanceRenderer


def time_renderer(tag, **kw):
    r = InstanceRenderer(instancer_config=inst, model=models["model"],
                         n_samples=1024, render_chunk=R, step_size=0.002, **kw)
    data = dict(rays_o=rays_o[None], rays_d=rays_d[None],
                t=np.tile([2.0, 8.0], (1, R, 1)).astype(np.float32),
                parameters=np.array([[1, 1, 1, 0.1, 0, 0, 1.0]], np.float32),
                cone_scale=np.full((1, R, 1), 0.005, np.float32))
    t0 = time.perf_counter()
    o = r(**data, training=False, key=jax.random.key(0))
    jax.block_until_ready(o["color_pred"])
    print(f"{tag}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    o = r(**data, training=False, key=jax.random.key(1))
    jax.block_until_ready(o["color_pred"])
    dt = time.perf_counter() - t0
    print(f"{tag}: warm {dt:.2f}s -> {R/dt:.0f} rays/s", flush=True)


time_renderer("compact160_chunked64k", net_chunk=65536, sample_budget_per_ray=160)
time_renderer("compact160_nochunk", net_chunk=1 << 21, sample_budget_per_ray=160)
time_renderer("dense_nochunk", net_chunk=1 << 22, sample_budget_per_ray=0)
