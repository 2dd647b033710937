# End-to-end demo: prefiltered grass training at reduced n_iters.  The
# dataset comes from the real offline toolchain (create_dataset -> blur ->
# nerf2tfr; scripts/make_demo_datasets.py), so Blur is driver parameter 0 and
# the renderer trains with blur_idx=0 (reference
# configs/config_grass_filtered_train.py:95-103).  Pairs with
# configs/demo_grass_filtered_render.py for the distance-sweep showcase.
import copy

from configs.config_grass_filtered_train import config as _full

config = copy.deepcopy(_full)
config["n_iters"] = 6000
config["lrate"] = 1e-3
config["train_dataset_config"]["prefetch"] = 2
config["val_dataset_config"]["data_loader_config"].update({"height": 64, "width": 64})
config["logger_config"].update({"i_img": 6000, "i_checkpoint": 2000})
