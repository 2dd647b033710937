# End-to-end demo: the shipped plush train config at reduced n_iters.
# Pair with tools/synth (datasets/materials/plush/tfr/train.tfr, parameter
# layout [geometry, albedo-multiplier, light dir x3]) and then
# configs/demo_plush_render.py — the bunny instanced-render story.
import copy
from configs.config_plush_train import config as _full
config = copy.deepcopy(_full)
config["n_iters"] = 6000
config["lrate"] = 1e-3
config["target_path"] = "logs/plush"
config["train_dataset_config"]["prefetch"] = 2
config["val_dataset_config"]["data_loader_config"].update({"height": 64, "width": 64})
config["logger_config"].update({"i_img": 6000, "i_checkpoint": 2000})
