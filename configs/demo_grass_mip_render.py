# End-to-end demo: MipInstanceRenderer distance sweep with the trained IPE
# model from configs/demo_grass_mip_train.py — the instancer's per-sample
# cone Gaussians (dirs, t, radii = blur * cone_scale / patch_scale, dists)
# feed the integrated positional encoding (reference renderer.py:475-587).
import copy

from configs.demo_grass_filtered_render import config as _base

config = copy.deepcopy(_base)
config["target_path"] = "logs/grass_mip"
config["model_config"].update(
    {
        "pos_embedding": {
            "module": "network.model.IntegratedPositionalEncoding",
            "n_freq_bands": 10,
        },
        "n_pos": 6,
        "n_parameters": [1, 3],
    }
)
config["renderer_config"]["module"] = "network.renderer.MipInstanceRenderer"
