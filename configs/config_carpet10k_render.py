# Instance-count SCALE bench config (not a reference scene): the carpet
# north-star render with 10,000 patch instances instead of 900 over the same
# cloth mesh (anchors from nerftex_tpu/tools/gen_assets.generate_scale_anchors;
# patch_scale shrunk ~sqrt(900/10000) so per-ray overlap counts stay
# comparable).  VERDICT r4 next #4: prove the per-block fan-test cull holds
# throughput at SURVEY §2.2's 10^4 sizing or motivate a grid-binned broad
# phase.  Benchmarked by scripts/bench_scene.py carpet10k (golden-checked).
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
    "patch_origins_path": "meshes/cloth10k_anchor_points.ply",
    "patch_scale": 0.027,
    "min_shadow_samples": 8,
    "n_shadow_samples": 256,
    "min_texture_samples": 8,
    "n_texture_samples": 256,
    "jitter_amount": 1.0,
    "instance_sampling_method": "nearest",
}

config = render_config(
    target_path="logs/carpet10k",
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
