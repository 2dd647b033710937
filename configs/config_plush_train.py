# Plush material training. Parity: reference configs/config_plush_train.py
# (whose tfr_path pointed at an absolute scratch dir; normalized here).
from configs._common import train_config

config = train_config(
    target_path="logs/plush",
    tfr_path="datasets/materials/plush/tfr/train.tfr",
    proxy_b0=[-1.3, -1.2, -0.3],
    proxy_b1=[1.3, 1.4, 1.3],
    n_parameters=[1, 4],
    val_param_constants=[
        [0, 0.5, 0, -0.707, 0.707],
        [1, 0.5, 0, -0.707, 0.707],
    ],
)
