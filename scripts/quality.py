"""Quality harness: train on the analytic swatch dataset, report PSNR.

Protocol (BASELINE.md): train the carpet-style ParamNerf on synthetic swatch
renders, then render held-out poses/parameters with the trained model and
compare against the analytic ground truth.  PSNR is computed on premultiplied
RGB over the full frame.
"""

import argparse
import time

import numpy as np


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def run(n_iters=2000, size=32, n_images=48, width=128, depth=6, n_samples=96,
        rays_per_image=128, batch=4, lrate=2e-3, report_every=500, seed=0,
        dtype="float32", net_chunk=65536, remat=False, cast_once=False):
    import jax
    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nerftex_tpu.utils import util, rng
    from nerftex_tpu.utils.util import EasyDict
    from nerftex_tpu.tools.synth import make_synthetic_tfrecord, render_swatch
    from nerftex_tpu.data.dataset import look_at_np
    import tempfile, os

    rng.set_seed(seed)
    tmp = tempfile.mkdtemp()
    tfr_path = os.path.join(tmp, "train.tfr")
    make_synthetic_tfrecord(tfr_path, n_images=n_images, size=size, seed=seed)

    b_0 = [-1.5, -1.3, -0.2]
    b_1 = [1.3, 1.3, 1.9]

    models = util.instantiate(EasyDict({
        "module": "network.model.ParamNerf",
        "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 8},
        "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
        "n_parameters": [1, 6], "depth": depth, "width": width, "skips": [depth // 2],
        "compute_dtype": dtype,
    }))
    from nerftex_tpu.render.renderer import Renderer
    from nerftex_tpu.render.loss import AlphaLoss
    from nerftex_tpu.render.train import make_optimizer, make_train_step
    from nerftex_tpu.data.ray_sampler import rays_from_camera_np
    from nerftex_tpu.ops.proxy import aabb_intersect_np

    renderer = Renderer(model=models["model"], n_samples=n_samples, perturb=True,
                        render_chunk=size * size, net_chunk=net_chunk,
                        remat_net_chunks=remat, cast_params_once=cast_once)
    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    optimizer = make_optimizer(lrate, 500)
    step_fn = make_train_step(renderer, loss_fn, optimizer, False, [1, 1, 1.0])

    dataset = util.instantiate(EasyDict({
        "module": "network.dataset.Dataset",
        "data_loader_config": {"module": "network.dataset.TFRecord", "tfr_path": tfr_path},
        "pixel_sampler_config": {"module": "network.pixel_sampler.Proxy",
                                 "n_samples": rays_per_image, "downsample_factor": 2},
        "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
        "proxy_config": {"module": "network.proxy.AABB", "b_0": b_0, "b_1": b_1},
        "batchsize": batch, "shuffle_buffer_size": 16,
    }))

    # Held-out view + parameters.
    val_pose = look_at_np(np.array([0.45, -0.7, 0.55]) * 5.0)
    val_params = np.array([0.6, 0.8, 0.9, 0.15, 0.2, -0.6, -0.75], np.float32)
    val_params[-3:] /= np.linalg.norm(val_params[-3:])
    gt = render_swatch(val_pose, val_params, 1, size, 0.63, np.asarray(b_0), np.asarray(b_1))
    gt_premult = gt.copy()
    gt_premult[..., :3] *= gt_premult[..., 3:]

    focal = size / np.tan(0.63 / 2) / 2
    idx = np.arange(size * size)
    loc = np.stack([idx // size, idx % size], -1).astype(np.float32)
    rays_o, rays_d, cone = rays_from_camera_np(loc, size, size, focal, val_pose)
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t_val = aabb_intersect_np(rays_o, rays_d, np.asarray(b_0, np.float32), np.asarray(b_1, np.float32))

    def render_val():
        out = renderer(
            rays_o=rays_o[None], rays_d=rays_d[None], t=t_val[None],
            parameters=val_params[None], cone_scale=cone[None], training=False,
        )
        img = np.concatenate(
            [np.asarray(out["color_pred"])[0], np.asarray(out["alpha_pred"])[0][:, None]], -1
        ).reshape(size, size, 4)
        return img

    import jax.numpy as jnp

    params = renderer.current_params()
    opt_state = optimizer.init(params)
    base_key = rng.stream_key(rng.STREAM_PERTURB)

    img0 = render_val()
    print(f"step 0: psnr {psnr(img0[..., :3], gt_premult[..., :3]):.2f} dB", flush=True)

    t0 = time.perf_counter()
    results = []
    for i, data in enumerate(dataset.take(n_iters)):
        batch_dev = {k: jnp.asarray(v) for k, v in data.items()}
        params, opt_state, loss = step_fn(params, opt_state, batch_dev, jax.random.fold_in(base_key, i))
        if (i + 1) % report_every == 0:
            models["model"].params = params["model"]
            img = render_val()
            p = psnr(img[..., :3], gt_premult[..., :3])
            results.append(p)
            print(f"step {i+1}: loss {float(loss):.4f} psnr {p:.2f} dB "
                  f"({(i+1)/(time.perf_counter()-t0):.1f} steps/s)", flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--report-every", type=int, default=500)
    # Train-numerics knobs so convergence gates can run at the SHIPPED
    # operating point (bf16 + chunk scan + remat), not just f32 defaults.
    ap.add_argument("--dtype", default="float32")
    ap.add_argument(
        "--net-chunk", type=int, default=65536,
        help="set below batch*rays*n_samples to exercise the chunk scan",
    )
    ap.add_argument(
        "--remat", nargs="?", const=True, default=False,
        choices=[True, False, "save_encodings"],
        type=lambda s: {"1": True, "true": True, "0": False, "false": False}
                       .get(s.lower(), s),
    )
    ap.add_argument("--cast-once", action="store_true",
                    help="renderer cast_params_once (docs/PERF.md §1.7)")
    args = ap.parse_args()
    run(n_iters=args.iters, size=args.size, report_every=args.report_every,
        dtype=args.dtype, net_chunk=args.net_chunk, remat=args.remat,
        cast_once=args.cast_once)
