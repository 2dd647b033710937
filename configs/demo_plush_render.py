# End-to-end demo: instanced render of the model trained by
# configs/demo_plush_train.py — the heaviest shipped workload (bunny mesh,
# nearest_blend overlap, checkerboard albedo texture, shadows, 1280
# samples/ray at step 5e-4) at 512x512.
import copy
from configs.config_plush_render import config as _full
config = copy.deepcopy(_full)
config["target_path"] = "logs/plush"
config["test_dataset_config"]["data_loader_config"].update({"height": 512, "width": 512})
config["test_dataset_config"]["data_loader_config"]["parameter_dist_config"]["distribution_config_1"]["sampler_config"]["n"] = 1
config["renderer_config"]["instancer_config"].update(
    {"max_hits": 128, "ray_block": 2048, "max_steps_per_ray": 1280}
)
# The upstream plush RENDER config requests param_depth=0/color_depth=1 while
# its TRAIN config builds the default trunk (an upstream inconsistency — that
# pair cannot share a checkpoint).  The demo restores the trained model, so
# use the train-side dims.
config["model_config"].pop("param_depth", None)
config["model_config"].pop("color_depth", None)
