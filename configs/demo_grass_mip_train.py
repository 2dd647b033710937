# End-to-end demo: the mip-NeRF (IPE) prefiltered training path.  Same
# blurred dataset as demo_grass_filtered_train, but trained through
# MipRenderer: the Blur parameter (index 0) is spliced out as the cone
# radius, positions become per-segment (mean, diag-cov) Gaussians, and the
# model encodes them with IntegratedPositionalEncoding over n_pos=6 inputs
# (reference network/renderer.py:356-473, network/layer.py:25-41 — classes
# the reference ships but no shipped config exercises; this demo pairs with
# configs/demo_grass_mip_render.py to run them trained end to end).
import copy

from configs.demo_grass_filtered_train import config as _base

config = copy.deepcopy(_base)
config["target_path"] = "logs/grass_mip"
config["model_config"].update(
    {
        "pos_embedding": {
            "module": "network.model.IntegratedPositionalEncoding",
            "n_freq_bands": 10,
        },
        "n_pos": 6,
        # Blur is consumed by the renderer as the cone radius, so the MLP
        # conditions on [Length] (geometry) + [LightXYZ] (appearance).
        "n_parameters": [1, 3],
    }
)
config["renderer_config"]["module"] = "network.renderer.MipRenderer"
