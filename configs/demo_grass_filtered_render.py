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
# The analytic training swatches light from above (tools/synth.py stores the
# light direction pointing down); the upstream constant (1, 0.5, 0.7) points
# up and renders the analytic material unlit.  [Blur, Length, LightXYZ]:
config["test_dataset_config"]["data_loader_config"]["parameter_dist_config"]["constants"] = [
    [0.5, 0.6, 0.3, 0.2, -0.93]
]
config["renderer_config"]["render_chunk"] = 8192
config["renderer_config"]["instancer_config"].update(
    # The far end of the sweep (radius 20) grazes the whole terrain: rays
    # cross many more patches than the near-field grass demo, so the hit and
    # marching-step caps go up until the sweep renders with zero drops.
    {"max_hits": 128, "ray_block": 1024, "max_steps_per_ray": 1024}
)
