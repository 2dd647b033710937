# End-to-end demo: distance-sweep instanced render of the model trained by
# configs/demo_grass_filtered_train.py.  The camera radius is itself a Grid
# distribution from 20 down to 5 (reference
# configs/config_grass_filtered_render.py:21-29), and blur_idx=0 routes the
# per-sample cone footprint into the trained Blur conditioning — the
# prefiltered anti-aliasing path.
import copy

from configs.config_grass_filtered_render import config as _full

config = copy.deepcopy(_full)
config["test_dataset_config"]["data_loader_config"].update({"height": 256, "width": 256})
config["renderer_config"]["render_chunk"] = 8192
config["renderer_config"]["instancer_config"].update({"max_hits": 32, "ray_block": 1024})
