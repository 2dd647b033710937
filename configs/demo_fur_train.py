# End-to-end demo: the shipped fur train config at reduced n_iters (the
# reference ships config_fur_train.py but no fur render config — training is
# the fur family's full upstream surface).  Dataset from
# scripts/make_demo_datasets.py (datasets/materials/fur/tfr/train.tfr).
import copy

from configs.config_fur_train import config as _full

config = copy.deepcopy(_full)
config["n_iters"] = 6000
config["lrate"] = 1e-3
config["target_path"] = "logs/fur"
config["train_dataset_config"]["prefetch"] = 2
config["val_dataset_config"]["data_loader_config"].update({"height": 64, "width": 64})
config["logger_config"].update({"i_img": 6000, "i_checkpoint": 2000})
