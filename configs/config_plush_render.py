# Plush render: patches on the bunny mesh (vertex anchors), nearest_blend
# overlap resolution, shadows, fine 0.0005 step size.
# Parity: reference configs/config_plush_render.py.
from configs._common import render_config

_loader = {
    "module": "network.dataset.GenerateData",
    "height": 800,
    "width": 800,
    "radius": 4,
    "angle": 0.63,
    "pose_dist_config": {
        "module": "data.distribution.Sphere",
        "u_range": (0.2, 0.2),
        "v_range": (0.8, 0.8),
    },
    "parameter_dist_config": {
        "module": "data.distribution.Concat",
        "distribution_config_0": {
            "module": "data.distribution.Constant",
            "constants": [[1, 1]],
        },
        "distribution_config_1": {
            "module": "data.distribution.Sphere",
            "sampler_config": {
                "module": "data.sampler.Concat",
                "sampler_config_0": {"module": "data.sampler.Constant", "c": 0.2},
                "sampler_config_1": {"module": "data.sampler.Grid"},
                "n": 5,
            },
            "u_range": (0.2, 0.2),
            "v_range": (0, 1),
        },
    },
}

_instancer = {
    "module": "instancer.instancer.Instancer",
    "b_0": [-1.1, -1.1, -0.2],
    "b_1": [1.1, 1.1, 1.1],
    "cast_shadow_rays": True,
    "textures": ["", "meshes/checkerboard.png", "light"],
    "mesh_path": "meshes/stanford_bunny.ply",
    "patch_scale": 0.04,
    "min_shadow_samples": 4,
    "n_shadow_samples": 128,
    "min_texture_samples": 4,
    "n_texture_samples": 128,
    "jitter_amount": 0.3,
    "instance_sampling_method": "nearest_blend",
}

config = render_config(
    target_path="logs/plush",
    loader=_loader,
    proxy_b0=[-0.9, -0.6, -0.8],
    proxy_b1=[0.9, 0.8, 0.9],
    n_parameters=[1, 4],
    instancer=_instancer,
    model_extra={"param_depth": 0, "color_depth": 1},
    renderer_extra={
        "n_samples": 1280,
        "n_importance": 0,
        "perturb": False,
        "raw_noise_std": 0,
        "render_chunk": 32768,
        "net_chunk": 65536,
        "density_reweighting": True,
        "step_size": 0.0005,
    },
)
