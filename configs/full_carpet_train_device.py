# Full-scale carpet training with the device-resident data pipeline
# (data/device_dataset.py): the 5,000 x 512^2 dataset lives in HBM as uint8
# and sampling runs inside the training jit — the host is out of the
# steady-state loop.  Plus the measured-fastest step config (bf16 compute +
# rematerialized net chunks, docs/PERF.md §1).
#
# NERFTEX_BENCH_ITERS (env) caps n_iters for wall-rate A/B runs.
import copy
import os

from configs.full_carpet_train import config as _full

config = copy.deepcopy(_full)
config["target_path"] = "logs/carpet_full_device"
config["train_dataset_config"]["device_resident"] = True
# The host LRU cache is dead weight once the dataset is device-resident;
# keep only enough for the factory's shape probe.
config["train_dataset_config"]["data_loader_config"]["cache_size"] = 4
config["model_config"]["compute_dtype"] = "bfloat16"
# "save_encodings" keeps the encoder outputs saved in the backward —
# step-identical to full remat, +1.6% measured (docs/PERF.md §1.5,
# runlogs/round4n: 85.8 -> 87.2 steps/s).
config["renderer_config"]["remat_net_chunks"] = "save_encodings"
# 16k-point chunks measured fastest (83.7 steps/s vs 66.5 at the reference's
# 65536: the [chunk,256] activation chains stay closer to VMEM instead of
# streaming HBM at every fusion boundary — docs/PERF.md §1.3).
config["renderer_config"]["net_chunk"] = 16384
# 100 steps per device program (train.make_fused_multi_step): divides the
# logger cadences, so host actions keep their exact steps.
config["steps_per_dispatch"] = 100

_iters = os.environ.get("NERFTEX_BENCH_ITERS")
if _iters:
    config["n_iters"] = int(_iters)
    config["logger_config"].update({"i_img": 10**9, "i_checkpoint": 10**9})
