# Carpet swatch dataset recipe: hemisphere poses, iid material parameters,
# sphere-sampled light direction. Parity: reference data/configs/config_carpet.py.
config = {
    "compute_device": "CPU",
    "seed": 0,
    "subsets": [
        {
            "name": "train",
            "cam_radius": 6,
            "pose_dist_config": {
                "module": "data.distribution.Hemisphere",
                "sampler_config": {"module": "data.sampler.Independent", "d": 2, "n": 5000},
            },
            "parameter_dist_config": {
                "module": "data.distribution.Concat",
                "distribution_config_0": {
                    "module": "data.distribution.AABB",
                    "sampler_config": {"module": "data.sampler.Independent", "d": 4},
                },
                "distribution_config_1": {"module": "data.distribution.Sphere"},
            },
        }
    ],
    "resolution": 512,
    "samples": 512,
    "light": "Directional",
    "collections": [
        {
            "name": "Carpet",
            "hair_drivers": ["Length"],
            "material_drivers": ["Saturation", "UndercoatValue"],
            "light_drivers": ["Ambient", "LightDirection"],
        }
    ],
    "pose_file_prefix": "transforms_",
    "pose_file_save_interval": 10,
    "target_path": "datasets/materials/carpet",
}
