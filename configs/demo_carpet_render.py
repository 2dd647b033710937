# End-to-end demo: instanced render of the model trained by
# configs/demo_carpet_train.py (256x256, 2 orbit views).
import copy
from configs.config_carpet_render import config as _full
config = copy.deepcopy(_full)
config["target_path"] = "logs/carpet"
config["test_dataset_config"]["data_loader_config"].update({"height": 256, "width": 256})
config["test_dataset_config"]["data_loader_config"]["pose_dist_config"]["sampler_config"]["n"] = 2
config["renderer_config"]["render_chunk"] = 8192
config["renderer_config"]["instancer_config"].update(
    # max_hits 48 renders this scene with zero dropped hit intervals
    # (32 dropped ~18k farthest intervals — visually nil but not clean).
    {"max_hits": 48, "ray_block": 1024}
)
