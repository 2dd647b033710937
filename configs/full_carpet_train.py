# Full-scale carpet training: the shipped config at the reference's
# AS-SHIPPED operating point (VERDICT r2 item 2) — 500k iterations over a
# 512^2 x 5000-view dataset (the reference trains on 5000 Blender views at
# 512px, data/configs/config_carpet.py; ours is the analytic swatch at the
# same scale), reference batch shapes (4 imgs x 256 Proxy rays x 256
# samples, configs/config_carpet_train.py:23,33,94-101) and the same
# Adam(5e-4) x0.1/500k decay.
#
# Deviations from the stock config, all operational:
#   * cache_size=5000: every decoded 512^2 image stays resident (~21 GB);
#     the reference's tf.data AUTOTUNE decode pool does not exist here and
#     this box has one core.
#   * keep_every_n_hours=1 (instead of 12): the full run takes ~3 h on one
#     v5e chip, so hourly preservation actually exercises the retention
#     logic within the run (VERDICT asks for pruning evidence).
#   * i_img=50000 (instead of 5000): validation renders are host-synchronous;
#     10 render pauses across the run instead of 100.
import copy

from configs.config_carpet_train import config as _stock

config = copy.deepcopy(_stock)
config["target_path"] = "logs/carpet_full"
config["train_dataset_config"]["data_loader_config"].update(
    {"tfr_path": "datasets/materials/carpet_full/tfr", "cache_size": 5000}
)
config["val_dataset_config"]["data_loader_config"].update({"height": 256, "width": 256})
config["logger_config"].update(
    {"i_img": 50000, "i_checkpoint": 1000, "max_to_keep": 3, "keep_every_n_hours": 1}
)
