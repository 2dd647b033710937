# Source swatches for the prefiltered (grass_filtered) pipeline: one geometry
# driver (Length) + a light direction, no material driver, so that after
# tools/blur.py prepends 'Blur' the driver vector is [Blur, Length, LightXYZ]
# = n_parameters=[2,3] (reference configs/config_grass_filtered_train.py:81).
# Parity: reference data/configs/config_carpet.py schema (the only shipped
# data config); analytic backend stands in for the missing .blend assets.
config = {
    "compute_device": "CPU",
    "seed": 0,
    "subsets": [
        {
            "name": "train",
            "cam_radius": 6,
            "pose_dist_config": {
                "module": "data.distribution.Hemisphere",
                "sampler_config": {"module": "data.sampler.Independent", "d": 2, "n": 96},
            },
            "parameter_dist_config": {
                "module": "data.distribution.Concat",
                "distribution_config_0": {
                    "module": "data.distribution.AABB",
                    "sampler_config": {"module": "data.sampler.Independent", "d": 1},
                },
                "distribution_config_1": {"module": "data.distribution.Sphere"},
            },
        }
    ],
    "resolution": 96,
    "samples": 512,
    "light": "Directional",
    "collections": [
        {
            "name": "Grass",
            "hair_drivers": ["Length"],
            "material_drivers": [],
            "light_drivers": ["LightDirection"],
        }
    ],
    "pose_file_prefix": "transforms_",
    "pose_file_save_interval": 10,
    "target_path": "datasets/materials/grass_filtered_src",
}
