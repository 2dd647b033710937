"""Standalone carpet-render benchmark (north-star workload)."""
import time, numpy as np, jax
from nerftex_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict

def build(render_chunk=8192, ray_block=256, max_hits=64, budget=160, n_samples=1024, compute_dtype="float32", fused_mlp=False, step_cap=512, net_chunk=65536, sorted_blocks=True, cull_budget=0, tri_cull_budget=0):
    rng.set_seed(0)
    import nerftex_tpu.models.mlp as mlp_mod
    mlp_mod._INIT_COUNTER[0] = 0
    models = util.instantiate(EasyDict({
        "module": "network.model.ParamNerf",
        "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 10},
        "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "n_parameters": [1, 6], "compute_dtype": compute_dtype}))
    if fused_mlp:
        from nerftex_tpu.kernels.mlp_pallas import fuse_model
        fuse_model(models["model"])
    return util.instantiate(EasyDict({
        "module": "network.renderer.InstanceRenderer",
        "n_samples": n_samples, "render_chunk": render_chunk, "net_chunk": net_chunk,
        "step_size": 0.002, "sample_budget_per_ray": budget,
        "sorted_blocks": sorted_blocks,
        "instancer_config": {
            "module": "instancer.instancer.Instancer",
            "b_0": [-1.4, -1.2, -0.1], "b_1": [1.2, 1.2, 1.8],
            "cast_shadow_rays": False,
            "textures": ["meshes/smooth_checkerboard.png", "", "", "", "light"],
            "mesh_path": "meshes/cloth_mesh.ply",
            "patch_origins_path": "meshes/cloth_anchor_points.ply",
            "patch_scale": 0.09, "jitter_amount": 1.0,
            "instance_sampling_method": "nearest",
            "max_hits": max_hits, "ray_block": ray_block,
            "max_steps_per_ray": step_cap, "cull_budget": cull_budget,
            "tri_cull_budget": tri_cull_budget,
        }, **models}))

def ray_data(h=512, w=512):
    from nerftex_tpu.data.dataset import look_at_np
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np
    from nerftex_tpu.ops.proxy import AABB
    focal = w / np.tan(0.55/2) / 2
    c2w = look_at_np(np.array([0.47, -0.65, 0.6]) * 6.0)
    idx = np.arange(h*w)
    loc = np.stack([idx // w, idx % w], -1).astype(np.float32)
    rays_o, rays_d, cone = rays_from_camera_np(loc, h, w, focal, c2w)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = AABB([-1.5,-1.5,-1.5],[1.5,1.5,1.5]).intersect_np(rays_o, rays_d)
    return dict(rays_o=rays_o[None], rays_d=rays_d[None], t=t[None],
                parameters=np.array([[1,1,1,.1,0,0,1.]],np.float32), cone_scale=cone[None])

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--max-hits", type=int, default=64)
    ap.add_argument("--budget", type=int, default=160)
    ap.add_argument("--n-samples", type=int, default=1024)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--step-cap", type=int, default=512)
    ap.add_argument("--cull", type=int, default=0)
    ap.add_argument("--tri-cull", type=int, default=0)
    args = ap.parse_args()
    renderer = build(args.chunk, args.block, args.max_hits, args.budget, args.n_samples, args.dtype, args.fused_mlp, args.step_cap, cull_budget=args.cull, tri_cull_budget=args.tri_cull)
    data = ray_data(args.size, args.size)
    t0 = time.perf_counter()
    out = renderer(**data, training=False, key=jax.random.key(0))
    jax.block_until_ready(out["color_pred"])
    print(f"first render (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
    for trial in range(2):
        t0 = time.perf_counter()
        out = renderer(**data, training=False, key=jax.random.key(1+trial))
        jax.block_until_ready(out["color_pred"])
        dt = time.perf_counter()-t0
        print(f"warm render: {dt:.2f}s -> {args.size*args.size/dt:.0f} rays/s", flush=True)
    a = np.asarray(out["alpha_pred"])[0]
    print(f"alpha stats: mean {a.mean():.3f}, frac>0.1 {(a>0.1).mean():.3f}", flush=True)
