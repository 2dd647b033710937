"""Instanced-patch renderers: device instancer -> conditioned MLP -> composite.

Re-designs of reference network/renderer.py:215-354 (InstanceRenderer) and
renderer.py:475-587 (MipInstanceRenderer).  The reference round-trips every
chunk through host numpy + Embree (renderer.py:253, instancer.pyx:38-54) and
compacts with gather/scatter; here the whole chunk — instancer sampling, MLP
evaluation and compositing — is one jit-compiled device program:

  - ray culling becomes masking (fixed shapes);
  - sample culling uses the structure of the instancer's output: valid
    samples are a per-ray *prefix* (dists > 0 for i < n_steps), so
    sample-major (transposed) fixed-budget compaction keeps the MLP batch
    dense while dropping only the deepest samples when over budget — the
    analogue of the reference's dynamic tf.where cull (renderer.py:284-287);
  - the terminator sample, density reweighting, patch_scale normalization
    and false-color debug path match the reference formulas exactly
    (renderer.py:300, 310, 318-354).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerftex_tpu.ops import volume
from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.render.renderer import Renderer, chunked_apply


class InstanceRenderer(Renderer):
    """Eval-only renderer marching rays through instanced patch volumes.

    Defaults frozen to the reference (renderer.py:219)."""

    def __init__(
        self,
        instancer_config: EasyDict = None,
        step_size: float = 0.002,
        density_scale: float = 1,
        density_reweighting: bool = True,
        false_color: bool = False,
        sample_budget_per_ray: int = 0,
        sorted_blocks: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        if isinstance(instancer_config, dict):
            self.instancer = util.instantiate(instancer_config)
            self.patch_scale = instancer_config["patch_scale"]
        else:
            # Pre-built Instancer object (tests / embedding use).
            self.instancer = instancer_config
            self.patch_scale = float(self.instancer.scene.patch_scale)
        self.step_size = step_size
        self.density_scale = density_scale
        self.density_reweighting = density_reweighting
        self.false_color = false_color
        # 0 (default) = dense masked grid over min(n_samples,
        # max_steps_per_ray) marching steps — the fast path on TPU (no
        # compaction machinery) and reference-exact when the cap covers
        # n_samples.  >0 caps the AVERAGE per-sample/MLP evaluations per ray
        # in a chunk (total budget = chunk * this; overflow drops the deepest
        # samples and is counted) — useful when occupancy is a small fraction
        # of a very large n_samples and memory is tight.
        self.sample_budget_per_ray = sample_budget_per_ray
        # Occupancy-sorted bucketed grid render (device.render_grid_sorted):
        # per-sample + MLP work scales with actual occupancy instead of the
        # worst-case grid.  Only used on the grid path (budget == 0).
        self.sorted_blocks = sorted_blocks
        if false_color:
            self.instance_color = jax.random.uniform(
                rng.stream_key(rng.STREAM_FALSE_COLOR), (self.instancer.n_instances(), 3)
            )

    # ------------------------------------------------------------------

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
        assert training is False, (
            "network.renderer.InstanceRenderer can only be used for evaluation."
        )
        k_inst, k_noise = jax.random.split(key)

        if self.sample_budget_per_ray > 0:
            inst = self.instancer.device.get_model_input_compact(
                rays_o, rays_d, parameters, self.n_samples, self.step_size,
                self.sample_budget_per_ray, key=k_inst,
            )
            color_map, alpha_map = self._shade_compact(
                params, inst, rays_o, rays_d, parameters, cone_scale, k_noise,
                composite_bkgd, bkgd_color,
            )
        elif self.sorted_blocks:
            def shade_block(inst_block, extra_block, k_shade):
                (cone_block,) = extra_block
                return self._shade(
                    params, inst_block, None, None, None, cone_block, k_shade,
                    composite_bkgd, bkgd_color,
                )

            def empty_block(ray_block, extra_block, k_shade):
                # Zero marching steps: every sample alpha is exactly 0 (the
                # +1e-10 cumprod guard rounds to 1.0f), so the composite
                # reduces to the terminator term alpha_last * color_last.
                color = ray_block["alpha_last"] * ray_block["color_last"][:, 0, :]
                return color, ray_block["alpha_last"][:, 0]

            (color_map, alpha_map), aux = self.instancer.device.render_grid_sorted(
                rays_o, rays_d, parameters, self.n_samples, self.step_size,
                k_inst, shade_block, extra=(cone_scale,), empty_block=empty_block,
            )
            inst = {
                "hit": aux["hit"],
                "overflow_hits": aux["overflow_hits"],
                "overflow_steps": aux["overflow_steps"],
                "overflow_cull": aux["overflow_cull"],
            }
        else:
            inst = self.instancer.get_model_input_dict(
                rays_o, rays_d, parameters, self.n_samples, self.step_size, key=k_inst
            )
            color_map, alpha_map = self._shade(
                params, inst, rays_o, rays_d, parameters, cone_scale, k_noise,
                composite_bkgd, bkgd_color,
            )

        # Rays culled by the proxy (t = inf) contribute nothing
        # (renderer.py:58-67); instancer misses already have zero weights.
        miss = jnp.isinf(t[:, 0]) | ~inst["hit"]
        valid = (~miss).astype(jnp.float32)
        color_map = color_map * valid[:, None]
        alpha_map = alpha_map * valid
        if composite_bkgd:
            color_map = color_map + (1.0 - alpha_map)[:, None] * jnp.asarray(
                bkgd_color, jnp.float32
            )

        return {
            "color_pred": color_map,
            "alpha_pred": alpha_map,
            "_overflow_hits": inst["overflow_hits"],
            "_overflow_steps": inst["overflow_steps"],
            "_overflow_cull": inst.get("overflow_cull", 0),
        }

    def _report_diagnostics(self, out: dict) -> None:
        # Parity with the reference's buffer warning (instancer.cpp:1036):
        # never drop anything silently.  The two causes are independent:
        # hit overflow is per-ray instance intervals beyond max_hits (the
        # farthest are dropped — usually behind ~full accumulated opacity);
        # step overflow is marching samples beyond the per-ray grid
        # (max_steps_per_ray / n_samples / sample_budget_per_ray).
        hits = out.pop("_overflow_hits", 0)
        steps = out.pop("_overflow_steps", 0)
        cull = out.pop("_overflow_cull", 0)
        if cull:
            # Unreachable since the round-3 exact-branch redesign (culled
            # branches are only taken when the keep set fits the budget);
            # kept as a tripwire for the invariant.
            print(
                f"WARNING: cull dropped {cull} candidates — this should be "
                f"impossible (exact-branch culling, device.py::_per_ray); "
                f"please report."
            )
        if hits:
            print(
                f"WARNING: hit capacity exceeded, dropped {hits} farthest "
                f"ray-instance intervals (raise max_hits)."
            )
        if steps:
            print(
                f"WARNING: sample capacity exceeded, dropped {steps} deepest "
                f"samples (raise n_samples / sample_budget_per_ray / "
                f"max_steps_per_ray)."
            )

    # -- core shading ----------------------------------------------------

    def _model_inputs(self, inst, rays_d, parameters, cone_scale):
        """Per-sample MLP inputs from the instancer output; blur scaling
        (renderer.py:260-263)."""
        params_map = inst["parameters"]
        if self.blur_idx is not None:
            blur_scale = cone_scale[..., None, :] * inst["t"][..., :, None] / self.patch_scale
            b = self.blur_idx
            params_map = jnp.concatenate(
                [
                    params_map[..., :b],
                    params_map[..., b, None] * blur_scale,
                    params_map[..., b + 1 :],
                ],
                axis=-1,
            )
        return inst["pts"], inst["rays_d"], params_map

    def _eval_mlp(self, params, model, pos, dirs, prms, mask):
        """Dense masked MLP evaluation for the reference-exact path
        (sample compaction lives in the instancer; see _shade_compact).
        pos [R,S,D], mask [R,S] -> (color [R,S,3], density [R,S])."""
        r, s = mask.shape
        color, density = chunked_apply(
            model.apply,
            params,
            (pos.reshape(r * s, -1), dirs.reshape(r * s, -1), prms.reshape(r * s, -1)),
            self.net_chunk,
        )
        return color.reshape(r, s, 3) * mask[..., None], density.reshape(r, s) * mask

    # -- compact path (instancer emits only valid samples) ----------------

    def _mlp_inputs_compact(self, inst, cone_scale):
        """Per-compacted-sample MLP inputs + blur scaling on [B] arrays."""
        prms = inst["parameters"]
        if self.blur_idx is not None:
            blur_scale = (
                cone_scale[inst["ray_idx"], 0] * inst["t"] / self.patch_scale
            )
            b = self.blur_idx
            prms = jnp.concatenate(
                [prms[:, :b], prms[:, b, None] * blur_scale[:, None], prms[:, b + 1 :]],
                axis=-1,
            )
        return inst["pts"], inst["rays_d"], prms

    def _scatter_composite(
        self, inst, color_c, density_c, n_rays, k_noise, composite_bkgd, bkgd_color
    ):
        """Reconstruct dense [R,S] fields from compacted per-sample MLP
        outputs and composite with the dense dists/terminator."""
        density_c = density_c * (
            inst["alpha_weight"] if self.density_reweighting else 1.0
        ) * self.density_scale

        if self.false_color:
            color_c = self.instance_color[inst["instance_id"]]

        S = inst["dists"].shape[1]
        taken = inst["taken"]
        flat_idx = inst["ray_idx"] * S + inst["i_idx"]
        color = (
            jnp.zeros((n_rays * S, 3))
            .at[flat_idx]
            .add(jnp.where(taken[:, None], color_c, 0.0))
            .reshape(n_rays, S, 3)
        )
        density = (
            jnp.zeros((n_rays * S,))
            .at[flat_idx]
            .add(jnp.where(taken, density_c, 0.0))
            .reshape(n_rays, S)
        )

        return volume.composite_precomputed_alpha(
            color,
            density,
            inst["dists"],
            inst["color_last"],
            inst["alpha_last"],
            self.patch_scale,
            composite_bkgd=False,
            bkgd_color=bkgd_color,
            raw_noise_std=self.raw_noise_std,
            noise_key=k_noise,
            map_exr=self.map_exr,
            # false_color pre-applied on the compacted colors above; the
            # compositor must not sigmoid them.
            false_color=color if self.false_color else None,
        )

    def _shade_compact(
        self, params, inst, rays_o, rays_d, parameters, cone_scale, k_noise, composite_bkgd, bkgd_color
    ):
        pos, dirs, prms = self._mlp_inputs_compact(inst, cone_scale)
        # Zero untaken (padding) inputs so the MLP never sees garbage values
        # (where, not multiply: padding can hold inf, and inf * 0 = nan).
        taken = inst["taken"][:, None]
        color_c, density_c = chunked_apply(
            self.model.apply,
            params["model"],
            (jnp.where(taken, pos, 0.0), jnp.where(taken, dirs, 0.0), jnp.where(taken, prms, 0.0)),
            self.net_chunk,
        )
        return self._scatter_composite(
            inst, color_c, density_c[:, 0], rays_o.shape[0], k_noise, composite_bkgd, bkgd_color
        )

    # -- dense path (test/compat) -----------------------------------------

    def _shade(
        self, params, inst, rays_o, rays_d, parameters, cone_scale, k_noise, composite_bkgd, bkgd_color
    ):
        pos, dirs, prms = self._model_inputs(inst, rays_d, parameters, cone_scale)
        mask = inst["dists"] > 0

        color, density = self._eval_mlp(
            params["model"], self.model, pos, dirs, prms, mask
        )
        density = density * (
            inst["alpha_weight"] if self.density_reweighting else 1.0
        ) * self.density_scale

        false_color = None
        if self.false_color:
            false_color = self.instance_color[inst["instance_id"]]

        color_map, alpha_map = volume.composite_precomputed_alpha(
            color,
            density,
            inst["dists"],
            inst["color_last"],
            inst["alpha_last"],
            self.patch_scale,
            composite_bkgd=False,
            bkgd_color=bkgd_color,
            raw_noise_std=self.raw_noise_std,
            noise_key=k_noise,
            map_exr=self.map_exr,
            false_color=false_color,
        )
        return color_map, alpha_map


class MipInstanceRenderer(InstanceRenderer):
    """IPE variant: per-sample cone Gaussians in patch-local coordinates
    (renderer.py:475-587)."""

    def __init__(self, blur_idx: int = None, **kwargs):
        super().__init__(**kwargs)
        # Hidden from the base class's per-sample blur handling
        # (renderer.py:478-482).
        self.blur_idx_mip = blur_idx

    def _model_inputs(self, inst, rays_d, parameters, cone_scale):
        raise NotImplementedError  # unused; _shade/_shade_compact overridden below

    def _shade_compact(
        self, params, inst, rays_o, rays_d, parameters, cone_scale, k_noise, composite_bkgd, bkgd_color
    ):
        b = self.blur_idx_mip
        prms = inst["parameters"]
        radii = prms[:, b] * cone_scale[inst["ray_idx"], 0] / self.patch_scale
        prms = jnp.concatenate([prms[:, :b], prms[:, b + 1 :]], axis=-1)

        cov = volume.cone_sample_cov(inst["rays_d"], inst["t"], radii, inst["dists_c"])
        pos = jnp.concatenate([inst["pts"], cov], axis=-1)

        taken = inst["taken"][:, None]
        color_c, density_c = chunked_apply(
            self.model.apply,
            params["model"],
            (jnp.where(taken, pos, 0.0), jnp.where(taken, inst["rays_d"], 0.0), jnp.where(taken, prms, 0.0)),
            self.net_chunk,
        )
        return self._scatter_composite(
            inst, color_c, density_c[:, 0], rays_o.shape[0], k_noise, composite_bkgd, bkgd_color
        )

    def _shade(
        self, params, inst, rays_o, rays_d, parameters, cone_scale, k_noise, composite_bkgd, bkgd_color
    ):
        b = self.blur_idx_mip
        params_map = inst["parameters"]

        # Splice the blur parameter out as the cone radius
        # (renderer.py:510-512).
        radii = params_map[..., b] * cone_scale[..., None, 0] / self.patch_scale
        params_map = jnp.concatenate(
            [params_map[..., :b], params_map[..., b + 1 :]], axis=-1
        )

        dirs_l = inst["rays_d"]
        r, s = inst["t"].shape
        cov = volume.cone_sample_cov(
            dirs_l.reshape(r * s, 3),
            inst["t"].reshape(r * s),
            radii.reshape(r * s),
            inst["dists"].reshape(r * s),
        ).reshape(r, s, 3)
        pos = jnp.concatenate([inst["pts"], cov], axis=-1)

        mask = inst["dists"] > 0
        color, density = self._eval_mlp(
            params["model"], self.model, pos, dirs_l, params_map, mask
        )
        density = density * (
            inst["alpha_weight"] if self.density_reweighting else 1.0
        ) * self.density_scale

        false_color = None
        if self.false_color:
            false_color = self.instance_color[inst["instance_id"]]

        return volume.composite_precomputed_alpha(
            color,
            density,
            inst["dists"],
            inst["color_last"],
            inst["alpha_last"],
            self.patch_scale,
            composite_bkgd=False,
            bkgd_color=bkgd_color,
            raw_noise_std=self.raw_noise_std,
            noise_key=k_noise,
            map_exr=self.map_exr,
            false_color=false_color,
        )
