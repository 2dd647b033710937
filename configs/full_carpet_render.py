# Full-scale showcase: 512^2 instanced carpet render from the checkpoint
# trained by configs/full_carpet_train.py (VERDICT r2 item 2: render the
# as-shipped showcase from the full-scale run).  Scene/shape values are the
# shipped config_carpet_render.py as-is (512^2, n_samples 1024, step 0.002).
import copy

from configs.config_carpet_render import config as _full

config = copy.deepcopy(_full)
config["target_path"] = "logs/carpet_full_render"
config["logger_config"]["source_path"] = "logs/carpet_full"
config["test_dataset_config"]["data_loader_config"]["pose_dist_config"]["sampler_config"]["n"] = 2
config["renderer_config"]["render_chunk"] = 262144
# Clean-coverage settings for the config's own orbit poses (the tuned bench
# knobs max_hits=48/cap=320/cull=448 drop hits on these poses — the showcase
# favors exactness over speed).
config["renderer_config"]["instancer_config"].update(
    {"max_hits": 96, "ray_block": 1024, "max_steps_per_ray": 1024}
)
