# End-to-end demo: instanced render of the model trained by
# configs/demo_grass_train.py over the terrain, point light + shadow rays.
import copy
from configs.config_grass_render import config as _full
config = copy.deepcopy(_full)
config["test_dataset_config"]["data_loader_config"].update({"height": 256, "width": 256})
config["test_dataset_config"]["data_loader_config"]["parameter_dist_config"]["distribution_config_1"]["sampler_config"]["n"] = 1
config["renderer_config"]["render_chunk"] = 8192
config["renderer_config"]["instancer_config"].update({"max_hits": 32, "ray_block": 1024})
