# Grass instanced render over the terrain mesh with a point light and
# shadow rays. Parity: reference configs/config_grass_render.py.
from configs._common import render_config

_loader = {
    "module": "network.dataset.GenerateData",
    "height": 512,
    "width": 512,
    "angle": 0.5,
    "radius": 6.0,
    "pose_dist_config": {
        "module": "data.distribution.Constant",
        "constants": [[0.30614675, -0.73910363, 0.6]],
    },
    "parameter_dist_config": {
        "module": "data.distribution.Concat",
        "distribution_config_0": {
            "module": "data.distribution.Constant",
            "constants": [[0, 0.33]],
        },
        "distribution_config_1": {
            "module": "data.distribution.Sphere",
            "sampler_config": {
                "module": "data.sampler.Concat",
                "sampler_config_0": {"module": "data.sampler.Constant", "c": 0.2},
                "sampler_config_1": {"module": "data.sampler.Grid"},
                "n": 5,
            },
            "u_range": [0.2, 0.2],
            "v_range": [0, 1.0],
        },
    },
}

_instancer = {
    "module": "instancer.instancer.Instancer",
    "b_0": [-1.6, -1.6, -0.1],
    "b_1": [1.8, 1.9, 1.3],
    "cast_shadow_rays": True,
    "textures": ["", "point"],
    "mesh_path": "meshes/terrain_mesh.ply",
    "patch_origins_path": "meshes/terrain_anchor_points.ply",
    "patch_scale": 0.1,
    "min_shadow_samples": 8,
    "n_shadow_samples": 128,
    "jitter_amount": 1.0,
    "instance_sampling_method": "nearest",
}

config = render_config(
    target_path="logs/grass",
    loader=_loader,
    proxy_b0=[-1.2, -1.2, -0.1],
    proxy_b1=[1.2, 1.2, 1],
    n_parameters=[1, 4],
    instancer=_instancer,
    renderer_extra={
        "n_samples": 1024,
        "render_chunk": 16384,
        "net_chunk": 32768,
        "step_size": 0.001,
    },
)
