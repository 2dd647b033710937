"""Cross-check the instanced compositing chain against the REFERENCE's own
InstanceRenderer (VERDICT r2 item 1).

The reference's eval chain (/root/reference/network/renderer.py:215-354 —
ray cull, dist<=0 sample cull, net_chunk MLP eval, scatter, density
reweighting, dists/patch_scale compositing, terminator append) needs no
Embree beyond one call site (renderer.py:253).  This script:

  1. builds OUR device instancer on the carpet scene with deterministic
     marching offsets, and renders a frame with OUR InstanceRenderer
     (dense reference-exact grid) using trained carpet weights;
  2. transplants those weights into the reference's keras ParamNerf
     (applying the documented FourierFeatures interleave<->grouped first-layer
     row permutation, PARITY.md §2.1) and verifies MLP equivalence on random
     inputs;
  3. instantiates the reference's InstanceRenderer through the reference's
     own util.instantiate with a mock instancer whose get_model_input
     forwards to OUR device instancer (numpy -> tf), and renders the same
     frame through the reference's real cull/composite code;
  4. reports framework-vs-reference pixel PSNR (target >= ~50 dB) and MLP
     max-abs agreement.

Run: PYTHONPATH=/root/repo python scripts/xcheck/run_xcheck.py [--size 96]
(CPU only; TF eager for the reference side.)
"""

import argparse
import os
import sys
import time

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = "/root/reference"

import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def ff_perm(d, n):
    """Row permutation FF(grouped, ours) -> FF(interleaved, reference).

    Ours (nerftex_tpu/models/encodings.py): [x, sin(2^0 x)..sin(2^{n-1} x),
    cos(2^0 x)..cos(2^{n-1} x)], each block spanning all d input dims.
    Reference (network/layer.py:8-23): [x, sin(2^0 x), cos(2^0 x), ...,
    sin(2^{n-1} x), cos(2^{n-1} x)].  Returns idx with
    W_ref[p, :] = W_ours[idx[p], :]."""
    idx = list(range(d))
    for k in range(n):
        idx += [d + k * d + j for j in range(d)]
        idx += [d + n * d + k * d + j for j in range(d)]
    return np.asarray(idx)


def block_perm(blocks):
    """Concatenate per-block row permutations; int = identity block."""
    out, off = [], 0
    for b in blocks:
        if isinstance(b, tuple):
            d, n = b
            p = ff_perm(d, n)
        else:
            p = np.arange(b)
        out.append(off + p)
        off += len(p)
    return np.concatenate(out)


def build_ours(size, n_samples, step_size, ckpt):
    """Our side: carpet scene instancer + dense InstanceRenderer + weights."""
    import pickle

    import jax

    from nerftex_tpu.instancing.instancer import Instancer
    from nerftex_tpu.render.instance_renderer import InstanceRenderer
    from nerftex_tpu.models import mlp as mlp_mod
    from nerftex_tpu.utils import rng
    from nerftex_tpu.utils.util import EasyDict

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    models = mlp_mod.ParamNerf(
        pos_embedding=EasyDict({"module": "nerftex_tpu.models.encodings.FourierFeatures", "n_freq_bands": 10}),
        dir_embedding=EasyDict({"module": "nerftex_tpu.models.encodings.FourierFeatures", "n_freq_bands": 4}),
        param_embedding=EasyDict({"module": "nerftex_tpu.models.encodings.FourierFeatures", "n_freq_bands": 4}),
        n_parameters=[1, 6],
    )
    state = pickle.load(open(ckpt, "rb"))
    weights = state["models"]["model"]
    models["model"].params = jax.tree.map(lambda a: np.asarray(a, np.float32), weights)

    instancer = Instancer(
        b_0=[-1.4, -1.2, -0.1], b_1=[1.2, 1.2, 1.8],
        mesh_path=os.path.join(REPO, "meshes/cloth_mesh.ply"),
        patch_origins_path=os.path.join(REPO, "meshes/cloth_anchor_points.ply"),
        patch_scale=0.09, jitter_amount=1.0,
        textures=[os.path.join(REPO, "meshes/smooth_checkerboard.png"), "", "", "", "light"],
        instance_sampling_method="nearest",
        max_hits=32, ray_block=256,
        max_steps_per_ray=n_samples,
        deterministic_offset=True,
    )
    renderer = InstanceRenderer(
        instancer_config=instancer, model=models["model"],
        n_samples=n_samples, step_size=step_size,
        render_chunk=size * size, net_chunk=65536,
        sorted_blocks=False, sample_budget_per_ray=0,
    )
    renderer.patch_scale = 0.09
    return models, instancer, renderer


def ray_frame(size):
    from nerftex_tpu.data.dataset import look_at_np
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np
    from nerftex_tpu.ops.proxy import aabb_intersect_np

    focal = size / np.tan(0.55 / 2) / 2
    c2w = look_at_np(np.array([0.47, -0.65, 0.6]) * 6.0)
    idx = np.arange(size * size)
    loc = np.stack([idx // size, idx % size], -1).astype(np.float32)
    rays_o, rays_d, cone = rays_from_camera_np(loc, size, size, focal, c2w)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = aabb_intersect_np(rays_o, rays_d, [-1.5, -1.5, -1.5], [1.5, 1.5, 1.5])
    return dict(
        rays_o=rays_o[None], rays_d=rays_d[None], t=t[None],
        parameters=np.array([[1, 1, 1, 0.1, 0, 0, 1.0]], np.float32),
        cone_scale=cone[None],
    )


def transplant(models, tf, ref_model):
    """Copy OUR trained pytree into the reference keras ParamNerf."""
    p = models["model"].params
    dense = [l for l in ref_model.layers if hasattr(l, "kernel")]
    ours = (
        [("trunk", i) for i in range(8)]
        + [("alpha",), ("bottleneck",), ("color_layers", 0), ("pre_color",), ("color",)]
    )
    # keras topological order: trunk x8, alpha, bottleneck, color_layers[0],
    # pre_color, color — alpha may sort after the color stack; match by name.
    by_name = {l.name: l for l in dense}
    ordered = []
    rest = [l for l in dense if l.name not in ("alpha", "color")]
    it = iter(rest)
    for spec in ours:
        if spec == ("alpha",):
            ordered.append(by_name["alpha"])
        elif spec == ("color",):
            ordered.append(by_name["color"])
        else:
            ordered.append(next(it))

    perms = {
        ("trunk", 0): block_perm([(3, 10), (1, 4)]),
        ("trunk", 5): block_perm([(3, 10), (1, 4), 256]),
        ("color_layers", 0): block_perm([(3, 4), (6, 4), 256]),
    }
    for spec, layer in zip(ours, ordered):
        node = p[spec[0]]
        if len(spec) == 2:
            node = node[spec[1]]
        w, b = np.asarray(node["w"]), np.asarray(node["b"])
        if spec in perms:
            w = w[perms[spec]]
        assert tuple(layer.kernel.shape) == w.shape, (spec, layer.kernel.shape, w.shape)
        layer.set_weights([w, b])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--n-samples", type=int, default=256)
    ap.add_argument("--step", type=float, default=0.002)
    ap.add_argument("--ckpt", default="logs/paired_ours/checkpoints/ckpt-2000.pkl")
    ap.add_argument("--out", default="logs/xcheck")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)

    # ---- phase 1: our side -------------------------------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")

    models, instancer, renderer = build_ours(args.size, args.n_samples, args.step, args.ckpt)
    data = ray_frame(args.size)

    t0 = time.time()
    ours = renderer(**data, training=False, key=jax.random.key(0))
    color_ours = np.asarray(ours["color_pred"]).reshape(args.size, args.size, 3)
    alpha_ours = np.asarray(ours["alpha_pred"]).reshape(args.size, args.size)
    print(f"[ours] dense frame rendered in {time.time() - t0:.1f}s "
          f"(alpha mean {alpha_ours.mean():.3f})", flush=True)

    # ---- phase 2: reference side ------------------------------------------
    # Reference modules (network/util/data) must win over the repo-root shims.
    sys.path.insert(0, REFERENCE)
    for mod in list(sys.modules):
        if mod.split(".")[0] in ("network", "util", "data", "instancer"):
            del sys.modules[mod]

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    from util import util as ref_util
    from util import EasyDict as RefEasyDict

    ref_models = ref_util.instantiate(RefEasyDict({
        "module": "network.model.ParamNerf",
        "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 10},
        "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "n_parameters": [1, 6],
    }))
    ref_model = ref_models["model"]
    transplant(models, tf, ref_model)

    # MLP parity on random inputs (isolates the weight transplant itself).
    rs = np.random.RandomState(3)
    pos = rs.uniform(-1, 1, (512, 3)).astype(np.float32)
    dirs = rs.normal(size=(512, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    prms = rs.uniform(0, 1, (512, 7)).astype(np.float32)
    c_ref, a_ref = ref_model((pos, dirs, prms), training=False)
    c_our, a_our = models["model"]((pos, dirs, prms))
    mlp_diff = max(
        float(np.abs(np.asarray(c_ref) - np.asarray(c_our)).max()),
        float(np.abs(np.asarray(a_ref) - np.asarray(a_our)).max()),
    )
    print(f"[transplant] MLP max|diff| = {mlp_diff:.2e}", flush=True)
    assert mlp_diff < 1e-4, "weight transplant failed"

    # Mock instancer: the reference calls get_model_input (renderer.py:253);
    # everything it receives comes from OUR device instancer.
    calls = []

    class MockInstancer:
        def __init__(self, patch_scale, inner):
            self.inner = inner

        def n_instances(self):
            return self.inner.n_instances()

        def get_model_input(self, rays_o, rays_d, parameters, n_samples, step_size):
            tup = self.inner.get_model_input(
                np.asarray(rays_o), np.asarray(rays_d), np.asarray(parameters),
                int(n_samples), float(step_size),
            )
            calls.append(np.asarray(rays_o).shape[0])
            return tuple(tf.constant(np.asarray(x)) for x in tup)

    import types

    mock_mod = types.ModuleType("xcheck_mock")
    mock_mod.MockInstancer = MockInstancer
    sys.modules["xcheck_mock"] = mock_mod

    from network.renderer import InstanceRenderer as RefInstanceRenderer

    ref_renderer = RefInstanceRenderer(
        instancer_config=RefEasyDict({
            "module": "xcheck_mock.MockInstancer",
            "patch_scale": 0.09,
            "inner": instancer,
        }),
        step_size=args.step,
        n_samples=args.n_samples,
        render_chunk=16384,
        net_chunk=65536,
        **{"model": ref_model},
    )

    t0 = time.time()
    ref_out = ref_renderer(
        rays_o=tf.constant(data["rays_o"]), rays_d=tf.constant(data["rays_d"]),
        t=tf.constant(data["t"]), parameters=tf.constant(data["parameters"]),
        cone_scale=tf.constant(data["cone_scale"]),
        composite_bkgd=False, bkgd_color=[1, 1, 1.0], training=False,
    )
    color_ref = np.asarray(ref_out["color_pred"]).reshape(args.size, args.size, 3)
    alpha_ref = np.asarray(ref_out["alpha_pred"]).reshape(args.size, args.size)
    print(f"[reference] frame rendered in {time.time() - t0:.1f}s "
          f"({len(calls)} instancer chunks: {calls})", flush=True)

    # ---- compare -----------------------------------------------------------
    p_rgb = psnr(color_ours, color_ref)
    p_a = psnr(alpha_ours, alpha_ref)
    print(f"[xcheck] framework-vs-reference: color {p_rgb:.1f} dB, "
          f"alpha {p_a:.1f} dB", flush=True)

    np.savez(
        os.path.join(args.out, "xcheck.npz"),
        color_ours=color_ours, alpha_ours=alpha_ours,
        color_ref=color_ref, alpha_ref=alpha_ref,
        psnr_rgb=p_rgb, psnr_alpha=p_a, mlp_diff=mlp_diff,
    )
    from nerftex_tpu.utils.image import write_image

    side = np.concatenate([
        np.concatenate([color_ours, alpha_ours[..., None].repeat(3, -1)], 1),
        np.concatenate([color_ref, alpha_ref[..., None].repeat(3, -1)], 1),
    ], 0)
    write_image(os.path.join(args.out, "xcheck_side_by_side.png"), np.clip(side, 0, 1))
    print(f"[xcheck] artifacts -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
