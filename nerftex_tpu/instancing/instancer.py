"""Public Instancer: the reference's Cython class surface, TPU-native inside.

Constructor kwargs mirror instancer.pyx:9 exactly; the Embree scene build
becomes the host scene compiler (instancing/scene.py) and get_model_input
runs on device (instancing/device.py) — no per-chunk host round-trip.
"""

import numpy as np

from nerftex_tpu.instancing.scene import Scene
from nerftex_tpu.instancing.device import DeviceInstancer


class Instancer:
    def __init__(
        self,
        b_0: list,
        b_1: list,
        cast_shadow_rays: bool = False,
        textures: list = (),
        transformations: list = (),
        mesh_path: str = None,
        patch_scale: float = 1.0,
        patch_origins_path: str = "",
        min_shadow_samples: int = 4,
        n_shadow_samples: int = 512,
        min_texture_samples: int = 4,
        n_texture_samples: int = 512,
        jitter_amount: float = 0,
        instance_sampling_method: str = "random",
        use_mean_distance: bool = False,
        auxiliary_meshes: list = (),
        transformation_export_path: str = None,
        max_hits: int = 64,
        ray_block: int = 256,
        shadow_samples: int = 32,
        max_steps_per_ray: int = 512,
        cull_budget: int = 0,
        tri_cull_budget: int = 0,
        shadow_cull_budget: int = 0,
        shadow_tri_cull_budget: int = 0,
        seed: int = 0,
        deterministic_offset: bool = False,
        pallas_selk: bool = False,
    ):
        self.scene = Scene(
            b_0,
            b_1,
            cast_shadow_rays=cast_shadow_rays,
            textures=textures,
            min_shadow_samples=min_shadow_samples,
            n_shadow_samples=n_shadow_samples,
            min_texture_samples=min_texture_samples,
            n_texture_samples=n_texture_samples,
            jitter_amount=jitter_amount,
            instance_sampling_method=instance_sampling_method,
            use_mean_distance=use_mean_distance,
            seed=seed,
        )

        for transformation in transformations:
            self.scene.add_instance(np.asarray(transformation, np.float32))

        if mesh_path is not None:
            self.scene.distribute_instances_on_mesh(mesh_path, patch_scale, patch_origins_path)
            if transformation_export_path is not None:
                self.scene.export_transformations(transformation_export_path)

        for aux_mesh_path, aux_texture_path in auxiliary_meshes:
            self.scene.add_mesh(aux_mesh_path, aux_texture_path)

        self.device = DeviceInstancer(
            self.scene,
            max_hits=max_hits,
            ray_block=ray_block,
            shadow_samples=shadow_samples,
            max_steps_per_ray=max_steps_per_ray,
            cull_budget=cull_budget,
            tri_cull_budget=tri_cull_budget,
            shadow_cull_budget=shadow_cull_budget,
            shadow_tri_cull_budget=shadow_tri_cull_budget,
            seed=seed,
            deterministic_offset=deterministic_offset,
            pallas_selk=pallas_selk,
        )

    def n_instances(self) -> int:
        return self.scene.n_instances()

    def get_model_input(self, rays_o, rays_d, parameters, n_samples, step_size):
        """Returns the reference's ten outputs (instancer.pyx:54) as device
        arrays: (rays_d, pts, t, dists, color_last, alpha_last, alpha_weight,
        instance_id, hit_idxs, parameters)."""
        out = self.device.get_model_input(
            np.asarray(rays_o, np.float32),
            np.asarray(rays_d, np.float32),
            np.asarray(parameters, np.float32),
            n_samples,
            step_size,
        )
        import jax.numpy as jnp

        hit_idxs = jnp.where(out["hit"])[0][:, None]
        return (
            out["rays_d"],
            out["pts"],
            out["t"],
            out["dists"],
            out["color_last"],
            out["alpha_last"],
            out["alpha_weight"],
            out["instance_id"],
            hit_idxs,
            out["parameters"],
        )

    def get_model_input_dict(self, rays_o, rays_d, parameters, n_samples, step_size, key=None):
        """Fixed-shape dict variant used by the jit-native InstanceRenderer
        (mask semantics instead of hit-index compaction)."""
        return self.device.get_model_input(rays_o, rays_d, parameters, n_samples, step_size, key)
