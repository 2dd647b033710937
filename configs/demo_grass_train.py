# End-to-end demo: grass train at reduced n_iters (pairs with
# configs/demo_grass_render.py for the shadows + point-light showcase).
import copy
from configs.config_grass_train import config as _full
config = copy.deepcopy(_full)
config["n_iters"] = 6000
config["lrate"] = 1e-3
config["val_dataset_config"]["data_loader_config"].update({"height": 64, "width": 64})
config["logger_config"].update({"i_img": 6000, "i_checkpoint": 2000})
