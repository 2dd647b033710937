# Fur material training. Parity: reference configs/config_fur_train.py.
from configs._common import train_config

config = train_config(
    target_path="logs/fur",
    tfr_path="datasets/materials/fur/tfr/train.tfr",
    proxy_b0=[-1.4, -1.1, -0.3],
    proxy_b1=[1.4, 1.5, 3],
    n_parameters=[1, 4],
    val_param_constants=[
        [0, 0.5, 0, -0.707, 0.707],
        [1, 0.5, 0, -0.707, 0.707],
    ],
)
