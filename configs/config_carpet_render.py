# Carpet instanced render: trained patch MLP instanced over the cloth mesh,
# orbiting camera sweep, spatially-varying fibre length from a checkerboard
# texture, directional light, no shadows.
# Parity: reference configs/config_carpet_render.py.
from configs._common import render_config

_orbit_loader = {
    "module": "network.dataset.GenerateData",
    "height": 512,
    "width": 512,
    "angle": 0.55,
    "radius": 6.0,
    "pose_dist_config": {
        "module": "data.distribution.Sphere",
        "sampler_config": {
            "module": "data.sampler.Concat",
            "sampler_config_0": {"module": "data.sampler.Independent"},
            "sampler_config_1": {"module": "data.sampler.Grid"},
            "n": 5,
        },
        "u_range": [0.3, 0.3],
        "v_range": [0, 1.0],
    },
    "parameter_dist_config": {
        "module": "data.distribution.Constant",
        "constants": [[1, 1, 1, 0.1, 0, 0, 1]],
    },
}

_instancer = {
    "module": "instancer.instancer.Instancer",
    "b_0": [-1.4, -1.2, -0.1],
    "b_1": [1.2, 1.2, 1.8],
    "cast_shadow_rays": False,
    "textures": ["meshes/smooth_checkerboard.png", "", "", "", "light"],
    "mesh_path": "meshes/cloth_mesh.ply",
    "patch_origins_path": "meshes/cloth_anchor_points.ply",
    "patch_scale": 0.09,
    "min_shadow_samples": 8,
    "n_shadow_samples": 256,
    "min_texture_samples": 8,
    "n_texture_samples": 256,
    "jitter_amount": 1.0,
    "instance_sampling_method": "nearest",
}

config = render_config(
    target_path="logs/carpet",
    loader=_orbit_loader,
    proxy_b0=[-1.5, -1.5, -1.5],
    proxy_b1=[1.5, 1.5, 1.5],
    n_parameters=[1, 6],
    instancer=_instancer,
    renderer_extra={
        "n_samples": 1024,
        "render_chunk": 16384,
        "net_chunk": 32768,
        "density_reweighting": True,
        "step_size": 0.002,
    },
)
