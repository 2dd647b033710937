# Grass material training. Parity: reference configs/config_grass_train.py.
from configs._common import train_config

config = train_config(
    target_path="logs/grass",
    tfr_path="datasets/materials/grass/tfr/train.tfr",
    proxy_b0=[-1.6, -1.6, -0.1],
    proxy_b1=[1.8, 1.9, 1.3],
    n_parameters=[1, 4],
    val_param_constants=[
        [0, 0.5, 0, -0.707, 0.707],
        [1, 0.5, 0, -0.707, 0.707],
    ],
)
