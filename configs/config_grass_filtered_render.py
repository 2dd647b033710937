# Prefiltered grass render: distance sweep (radius is itself a distribution)
# with the blur parameter driving the integrated positional encoding path.
# Parity: reference configs/config_grass_filtered_render.py.
from configs._common import render_config

_loader = {
    "module": "network.dataset.GenerateData",
    "height": 512,
    "width": 512,
    "angle": 0.5,
    "radius": {
        "module": "data.distribution.AABB",
        "sampler_config": {"module": "data.sampler.Grid", "n": 5},
        "b_0": 20,
        "b_1": 5,
    },
    "pose_dist_config": {
        "module": "data.distribution.Constant",
        "constants": [[0.3, -0.74, 0.6]],
    },
    "parameter_dist_config": {
        "module": "data.distribution.Constant",
        "constants": [[0.5, 0, 1, 0.5, 0.7]],
    },
    "dataset_size": 5,
}

_instancer = {
    "module": "instancer.instancer.Instancer",
    "b_0": [-2, -2, -0.5],
    "b_1": [2, 2, 2.5],
    "cast_shadow_rays": False,
    "textures": ["", "", "light"],
    "mesh_path": "meshes/terrain_mesh.ply",
    "patch_origins_path": "meshes/terrain_anchor_points.ply",
    "patch_scale": 0.1,
    "jitter_amount": 1.0,
    "instance_sampling_method": "nearest",
}

config = render_config(
    target_path="logs/grass_filtered",
    loader=_loader,
    proxy_b0=[-1.2, -1.2, -0.1],
    proxy_b1=[1.2, 1.2, 1],
    n_parameters=[2, 3],
    instancer=_instancer,
    renderer_extra={
        "n_samples": 1024,
        "render_chunk": 16384,
        "net_chunk": 32768,
        "step_size": 0.001,
        "blur_idx": 0,
    },
)
