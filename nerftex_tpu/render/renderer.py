"""Differentiable ray marchers, TPU-native.

Re-designs of reference network/renderer.py:31-213 (Renderer) and
renderer.py:356-473 (MipRenderer):

  - one jit-compiled fixed-shape render over a ray chunk instead of eager
    per-chunk TF ops; missed rays (t = inf) are handled by masking, not
    gather/scatter compaction (TPU-friendly static shapes);
  - the functional core (`render_rays`) takes model params explicitly so the
    training loop can differentiate straight through it;
  - the MLP is evaluated in `net_chunk` mini-batches via lax.map to bound
    activation memory inside jit, mirroring the reference's chunking
    (renderer.py:160-163).

Instanced renderers live in nerftex_tpu/render/instance_renderer.py.
"""

import jax
import jax.numpy as jnp

from nerftex_tpu.ops import volume
from nerftex_tpu.utils import rng


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def chunked_apply(apply_fn, params, inputs, net_chunk: int, remat: "bool | str" = False,
                  unroll: int = 1, cast_params=None):
    """Evaluate apply_fn(params, *inputs) over the leading axis in
    mini-batches of net_chunk (a chunk scan keeps peak activation memory at
    one chunk).  inputs: tuple of [N, ...] arrays; outputs concatenated back.

    unroll>1 unrolls the chunk scan (lax.scan unroll): in the TRANSPOSE,
    each scan iteration adds every parameter leaf's chunk gradient into the
    carry as its own tiny fusion — 13.2% of the train step was these
    overhead-bound [256,256] accumulates (docs/PERF.md §1.6, 12 us/exec at
    a 1 us roofline).  Unrolling lets XLA chain k accumulates per loop trip
    and amortize the fusion overhead.  The adds keep their sequential
    association, but XLA fuses the unrolled body differently (fma
    contraction), so grads match unroll=1 to ~1 ulp rather than
    bit-exactly (tests/test_flat_params.py pins the tolerance).

    remat=True wraps the chunk body in jax.checkpoint: backward recomputes
    the chunk's activations instead of stacking every layer into
    [n_chunks, net_chunk, width] loop-carried buffers — the dynamic-update-
    slice stacking was measured at 36% of the train step (docs/PERF.md §1).
    remat="save_encodings" additionally SAVES the encoder outputs (tagged
    `checkpoint_name(..., "encoding")` in models/mlp.py) so the backward
    skips the frequency-lift + sin/cos recompute — ~10% of the train-step
    budget was the sine_convert family, half of it remat recompute
    (docs/PERF.md §1.4/§1.5); value/grad-identical to remat=True.

    cast_params=<dtype> converts every f32 parameter leaf to that dtype
    ONCE, OUTSIDE the chunk scan, instead of per use inside each chunk body
    (models/mlp._dense casts per call; on an already-cast leaf that astype
    is a no-op).  Consequence for the TRANSPOSE: the scan accumulates each
    weight's chunk gradients in the COMPUTE dtype/layout and converts to
    f32 once at the cast site — instead of one bf16->f32
    convert-and-relayout fusion per leaf per chunk (the §1.4
    `bf16[32,2,8,128]` weight-grad relayout family, ~11% of the step).
    Numerics: bit-identical when cast_params == the leaves' dtype (no-op
    cast); for bf16 the per-chunk gradient SUMMATION rounds to bf16 between
    chunks (~2^-9 relative per add) rather than f32 — pinned by
    tests/test_cast_once.py and gated on measured convergence quality."""
    n = inputs[0].shape[0]
    if cast_params is not None:
        cast_params = jnp.dtype(cast_params)
        params = jax.tree.map(
            lambda w: w.astype(cast_params)
            if getattr(w, "dtype", None) == jnp.float32 else w,
            params,
        )
    if isinstance(remat, str) and remat != "save_encodings":
        raise ValueError(
            f"remat={remat!r}: the only string policy is 'save_encodings' "
            "(bool for plain on/off)"
        )
    if remat == "save_encodings":
        body = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.save_only_these_names("encoding"),
        )
    elif remat:
        body = jax.checkpoint(apply_fn)
    else:
        body = apply_fn
    if n <= net_chunk:
        return body(params, *inputs)

    n_pad = _round_up(n, net_chunk)
    padded = tuple(
        jnp.concatenate([x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)])
        if n_pad > n
        else x
        for x in inputs
    )
    stacked = tuple(x.reshape((n_pad // net_chunk, net_chunk) + x.shape[1:]) for x in padded)

    _, outs = jax.lax.scan(
        lambda carry, xs: (carry, body(params, *xs)),
        None, stacked, unroll=max(1, int(unroll)),
    )
    outs = jax.tree.map(lambda o: o.reshape((n_pad,) + o.shape[2:])[:n], outs)
    return outs


class Renderer:
    """Stratified-sampling volume renderer (train-time path).

    Defaults frozen to the reference's (renderer.py:34)."""

    def __init__(
        self,
        model=None,
        model_fine=None,
        n_samples: int = 64,
        n_importance: int = 0,
        perturb: bool = True,
        raw_noise_std: float = 0,
        render_chunk: int = 32768,
        net_chunk: int = 65536,
        downsampling_factor: int = 1,
        blur_idx: int = None,
        map_exr: bool = False,
        remat_net_chunks=False,  # False | True | "save_encodings"
        net_chunk_unroll: int = 1,
        cast_params_once: bool = False,
        **kwargs,
    ) -> None:
        self.model = model
        self.model_fine = model_fine
        self.n_samples = n_samples
        self.n_importance = n_importance
        self.perturb = perturb
        self.raw_noise_std = raw_noise_std
        self.render_chunk = render_chunk
        self.net_chunk = net_chunk
        self.downsampling_factor = downsampling_factor
        self.blur_idx = blur_idx
        self.map_exr = map_exr
        # jax.checkpoint the net_chunk bodies: backward recomputes chunk
        # activations instead of stacking them across the lax.map (trades
        # one extra MLP forward for the 36%-of-step DUS traffic, PERF.md §1).
        self.remat_net_chunks = remat_net_chunks
        # Chunk-scan unroll factor (chunked_apply docstring; PERF.md §1.6).
        self.net_chunk_unroll = int(net_chunk_unroll)
        # Cast params to the model's compute dtype once per step, outside
        # the chunk scan (chunked_apply docstring; PERF.md §1.7).
        self.cast_params_once = bool(cast_params_once)
        self._call_counter = 0
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # functional core
    # ------------------------------------------------------------------

    def current_params(self) -> dict:
        params = {"model": self.model.params}
        if self.model_fine is not None:
            params["model_fine"] = self.model_fine.params
        return params

    def render_rays(
        self,
        params: dict,
        rays_o,
        rays_d,
        t,
        parameters,
        cone_scale,
        key,
        composite_bkgd: bool,
        bkgd_color,
        training: bool,
    ) -> dict:
        """March a flat chunk of rays [R,...]; pure in (params, key)."""
        k_perturb, k_noise, k_noise2, k_imp = jax.random.split(key, 4)

        miss = jnp.isinf(t[:, 0])
        t_safe = jnp.where(miss[:, None], 0.0, t)

        rays_d_n = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        z_vals = volume.stratified_z_vals(t_safe, self.n_samples, self.perturb and training, k_perturb)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

        color, density = self._evaluate_model(
            params["model"], self.model, pts, rays_d_n, parameters, cone_scale, z_vals
        )

        noise_std = self.raw_noise_std
        color_map, alpha_map, weights, _ = volume.composite(
            color,
            density,
            z_vals,
            rays_d,
            composite_bkgd=False,
            bkgd_color=bkgd_color,
            raw_noise_std=noise_std,
            noise_key=k_noise,
            map_exr=self.map_exr,
        )

        out = {"color_pred": color_map, "alpha_pred": alpha_map}

        if self.n_importance > 0:
            z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            # NOTE: det=self.perturb replicates the reference verbatim
            # (renderer.py:128), including its inverted-vs-bmild/nerf sense.
            z_samples = volume.sample_pdf(
                z_vals_mid, weights[..., 1:-1], self.n_importance, det=self.perturb, key=k_imp
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
            pts = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]

            fine_params = params.get("model_fine", params["model"])
            fine_model = self.model if self.model_fine is None else self.model_fine
            color_i, density_i = self._evaluate_model(
                fine_params, fine_model, pts, rays_d_n, parameters, cone_scale, z_all
            )
            color_map_i, alpha_map_i, _, _ = volume.composite(
                color_i,
                density_i,
                z_all,
                rays_d,
                composite_bkgd=False,
                bkgd_color=bkgd_color,
                raw_noise_std=noise_std,
                noise_key=k_noise2,
                map_exr=self.map_exr,
            )
            out = {
                "color_pred": color_map_i,
                "alpha_pred": alpha_map_i,
                "color_pred_coarse": color_map,
                "alpha_pred_coarse": alpha_map,
            }

        # Missed rays contribute nothing; with composite_bkgd they show the
        # background color (reference scatters bkgd into misses,
        # renderer.py:84-86, and composites hits at renderer.py:210-211).
        valid = (~miss).astype(jnp.float32)
        for name in list(out):
            v = out[name]
            v = v * (valid[:, None] if v.ndim == 2 else valid)
            if composite_bkgd and "color" in name:
                alpha_name = name.replace("color", "alpha")
                v = v + (1.0 - jnp.where(miss, 0.0, out[alpha_name]))[:, None] * jnp.asarray(
                    bkgd_color, jnp.float32
                )
            out[name] = v

        return out

    def _evaluate_model(self, model_params, model, pos, dirs, parameters, cone_scale, z_vals):
        """Flatten [R,S,...] samples and run the MLP in net_chunk pieces
        (renderer.py:145-168).  Optional blur_idx: scale that parameter by the
        cone footprint cone_scale*z (renderer.py:155-158)."""
        r, s = pos.shape[0], pos.shape[1]
        pos_flat = pos.reshape(r * s, pos.shape[-1])
        dirs_flat = jnp.repeat(dirs, s, axis=0)
        params_flat = jnp.repeat(parameters, s, axis=0)

        if self.blur_idx is not None:
            blur_scale = (cone_scale[..., None, :] * z_vals[..., :, None]).reshape(r * s, 1)
            b = self.blur_idx
            params_flat = jnp.concatenate(
                [params_flat[:, :b], params_flat[:, b, None] * blur_scale, params_flat[:, b + 1 :]],
                axis=-1,
            )

        color, density = chunked_apply(
            model.apply, model_params, (pos_flat, dirs_flat, params_flat),
            self.net_chunk, remat=self.remat_net_chunks,
            unroll=self.net_chunk_unroll,
            cast_params=(getattr(model, "compute_dtype", None)
                         if self.cast_params_once else None),
        )
        return color.reshape(r, s, 3), density.reshape(r, s)

    # ------------------------------------------------------------------
    # batch driver (mirrors Renderer.__call__, renderer.py:47-90)
    # ------------------------------------------------------------------

    def apply(self, params, data: dict, key, composite_bkgd=False, bkgd_color=(1, 1, 1.0), training=True):
        """Differentiable whole-batch render used by the training loop.
        data: {rays_o [B,R,3], rays_d, t [B,R,2], parameters [B,P],
        cone_scale [B,R,1]}.  Returns dict of [B,R,...]."""
        rays_o = data["rays_o"]
        b, r = rays_o.shape[0], rays_o.shape[1]

        flat = self._flatten_batch(data)
        out = self.render_rays(
            params,
            flat["rays_o"],
            flat["rays_d"],
            flat["t"],
            flat["parameters"],
            flat["cone_scale"],
            key,
            composite_bkgd,
            bkgd_color,
            training,
        )
        return {k: v.reshape((b, r) + v.shape[1:]) for k, v in out.items()}

    @staticmethod
    def _flatten_batch(data: dict) -> dict:
        rays_o = data["rays_o"]
        b, r = rays_o.shape[0], rays_o.shape[1]
        parameters = jnp.asarray(data["parameters"], jnp.float32)
        if parameters.shape[-1] == 0:
            parameters = jnp.zeros((b, 0), jnp.float32)
        return {
            "rays_o": jnp.reshape(rays_o, (b * r, -1)),
            "rays_d": jnp.reshape(data["rays_d"], (b * r, -1)),
            "t": jnp.reshape(data["t"], (b * r, -1)),
            "parameters": jnp.repeat(parameters, r, axis=0),
            "cone_scale": jnp.reshape(data["cone_scale"], (b * r, -1)),
        }

    def __call__(
        self,
        rays_o,
        rays_d,
        t,
        parameters,
        cone_scale,
        composite_bkgd: bool = False,
        bkgd_color=(1, 1, 1.0),
        training: bool = True,
        key=None,
        **kwargs,
    ) -> dict:
        """Eval-style chunked render over a [B,R] ray grid: pads the flat ray
        list to render_chunk multiples and loops a single jitted chunk fn."""
        if key is None:
            key = rng.stream_key(rng.STREAM_PERTURB, self._call_counter)
            self._call_counter += 1

        data = {
            "rays_o": jnp.asarray(rays_o, jnp.float32),
            "rays_d": jnp.asarray(rays_d, jnp.float32),
            "t": jnp.asarray(t, jnp.float32),
            "parameters": jnp.asarray(parameters, jnp.float32),
            "cone_scale": jnp.asarray(cone_scale, jnp.float32),
        }
        b, r = data["rays_o"].shape[0], data["rays_o"].shape[1]
        flat = self._flatten_batch(data)
        n = b * r

        chunk = min(self.render_chunk, n)
        n_pad = _round_up(n, chunk)
        if n_pad > n:
            pad = n_pad - n
            flat = {
                k: jnp.concatenate(
                    [v, jnp.full((pad,) + v.shape[1:], jnp.inf if k == "t" else 0.0, v.dtype)]
                )
                for k, v in flat.items()
            }

        fn = self._chunk_fn(chunk, bool(composite_bkgd), tuple(bkgd_color), bool(training))
        params = self.current_params()

        outs = []
        for i in range(0, n_pad, chunk):
            chunk_key = jax.random.fold_in(key, i)
            outs.append(
                fn(
                    params,
                    flat["rays_o"][i : i + chunk],
                    flat["rays_d"][i : i + chunk],
                    flat["t"][i : i + chunk],
                    flat["parameters"][i : i + chunk],
                    flat["cone_scale"][i : i + chunk],
                    chunk_key,
                )
            )

        out = {}
        for name in outs[0]:
            if name.startswith("_"):
                # Diagnostic scalars (e.g. sample-overflow counts) sum over
                # chunks instead of reshaping to the ray grid.
                out[name] = sum(int(o[name]) for o in outs)
                continue
            v = jnp.concatenate([o[name] for o in outs], 0)[:n]
            out[name] = v.reshape((b, r) + v.shape[1:])
        self._report_diagnostics(out)
        return out

    def _report_diagnostics(self, out: dict) -> None:
        pass

    def _chunk_fn(self, chunk, composite_bkgd, bkgd_color, training):
        cache_key = (chunk, composite_bkgd, bkgd_color, training)
        if cache_key not in self._jit_cache:

            @jax.jit
            def fn(params, rays_o, rays_d, t, parameters, cone_scale, key):
                return self.render_rays(
                    params, rays_o, rays_d, t, parameters, cone_scale, key,
                    composite_bkgd, list(bkgd_color), training,
                )

            self._jit_cache[cache_key] = fn
        return self._jit_cache[cache_key]


class MipRenderer(Renderer):
    """Cone-marching renderer with integrated positional encodings for
    training prefiltered models (renderer.py:356-473)."""

    def __init__(self, blur_idx: int = None, mip_importance: bool = False, **kwargs):
        super().__init__(**kwargs)
        # Hide blur_idx from the base class's per-sample filter handling
        # (renderer.py:362-363).
        self.blur_idx_mip = blur_idx
        # Opt-in extension BEYOND the reference: the reference raises
        # NotImplementedError for n_importance > 0 on the mip path
        # (renderer.py:403-404), and so do we by default.  With
        # mip_importance=True a hierarchical pass resamples segment fence
        # posts from the coarse weights histogram (mip-NeRF style:
        # sample_pdf over bins = the S+1 posts, weights = the S segment
        # weights) and re-marches the union of posts (PARITY.md).
        self.mip_importance = mip_importance

    def render_rays(
        self,
        params,
        rays_o,
        rays_d,
        t,
        parameters,
        cone_scale,
        key,
        composite_bkgd,
        bkgd_color,
        training,
    ) -> dict:
        if self.n_importance > 0 and not self.mip_importance:
            raise NotImplementedError(
                "Importance sampling for mip-NeRF style rendering is not implemented "
                "(parity with renderer.py:403-404; opt in with mip_importance: true)."
            )

        k_perturb, k_noise, k_noise2, k_imp = jax.random.split(key, 4)

        miss = jnp.isinf(t[:, 0])
        t_safe = jnp.where(miss[:, None], 0.0, t)

        rays_d_n = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        z_vals = volume.stratified_z_vals(
            t_safe, self.n_samples + 1, self.perturb and training, k_perturb
        )

        # Splice the blur parameter out as the cone radius (renderer.py:387-388).
        b = self.blur_idx_mip
        blur = parameters[..., b, None] * cone_scale
        parameters = jnp.concatenate([parameters[..., :b], parameters[..., b + 1 :]], axis=-1)

        mean, cov_diag = volume.cone_segment_gaussians(rays_o, rays_d, z_vals, blur)
        pts = jnp.concatenate([mean, cov_diag], axis=-1)

        color, density = self._evaluate_model(
            params["model"], self.model, pts, rays_d_n, parameters, None, None
        )

        color_map, alpha_map, weights, _ = volume.composite(
            color,
            density,
            z_vals,
            rays_d,
            composite_bkgd=False,
            bkgd_color=bkgd_color,
            raw_noise_std=self.raw_noise_std,
            noise_key=k_noise,
            map_exr=self.map_exr,
            repeat_last_dist=False,
        )

        out = {"color_pred": color_map, "alpha_pred": alpha_map}

        if self.n_importance > 0:
            # Hierarchical mip pass (extension; see __init__).  New fence
            # posts are drawn from the piecewise-constant segment pdf —
            # bins are the S+1 posts, weights the S segment weights — then
            # the union of posts defines S + n_importance finer frustums
            # for the fine march.  Unlike the classic path's pinned
            # det=self.perturb quirk (renderer.py:128), this extension uses
            # the conventional sense: stratified draws while training with
            # perturb, deterministic at eval.
            z_samples = volume.sample_pdf(
                z_vals, weights, self.n_importance,
                det=not (self.perturb and training), key=k_imp,
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)

            mean_i, cov_diag_i = volume.cone_segment_gaussians(
                rays_o, rays_d, z_all, blur
            )
            pts_i = jnp.concatenate([mean_i, cov_diag_i], axis=-1)
            fine_params = params.get("model_fine", params["model"])
            fine_model = self.model if self.model_fine is None else self.model_fine
            color_i, density_i = self._evaluate_model(
                fine_params, fine_model, pts_i, rays_d_n, parameters, None, None
            )
            color_map_i, alpha_map_i, _, _ = volume.composite(
                color_i,
                density_i,
                z_all,
                rays_d,
                composite_bkgd=False,
                bkgd_color=bkgd_color,
                raw_noise_std=self.raw_noise_std,
                noise_key=k_noise2,
                map_exr=self.map_exr,
                repeat_last_dist=False,
            )
            out = {
                "color_pred": color_map_i,
                "alpha_pred": alpha_map_i,
                "color_pred_coarse": color_map,
                "alpha_pred_coarse": alpha_map,
            }

        valid = (~miss).astype(jnp.float32)
        for name in list(out):
            v = out[name]
            v = v * (valid[:, None] if v.ndim == 2 else valid)
            if composite_bkgd and "color" in name:
                v = v + (1.0 - jnp.where(miss, 0.0, out["alpha_pred"]))[:, None] * jnp.asarray(
                    bkgd_color, jnp.float32
                )
            out[name] = v
        return out
