# Carpet material: train the conditioned patch MLP from TFRecord swatch renders.
# Parity: reference configs/config_carpet_train.py.
from configs._common import train_config

config = train_config(
    target_path="logs/carpet",
    tfr_path="datasets/materials/carpet/tfr/train.tfr",
    proxy_b0=[-1.5, -1.3, -0.2],
    proxy_b1=[1.3, 1.3, 1.9],
    n_parameters=[1, 6],
    # [fibre length | saturation, undercoat, ambient, light direction x3]
    val_param_constants=[
        [0, 1, 1, 0.1, 0, -0.707, 0.707],
        [1, 1, 1, 0.1, 0, -0.707, 0.707],
    ],
)
