# Prefiltered grass: trains on gaussian-blurred swatches where parameter 0 is
# the blur radius (created by tools/blur.py), so blur_idx=0 and raw density
# noise regularizes the prefiltered density field.
# Parity: reference configs/config_grass_filtered_train.py.
from configs._common import train_config

config = train_config(
    target_path="logs/grass_filtered",
    tfr_path="datasets/materials/grass_filtered/tfr/filtered.tfr",
    proxy_b0=[-2.5, -2.5, -1],
    proxy_b1=[2.5, 2.5, 2.5],
    n_parameters=[2, 3],
    val_param_constants=[
        [0, 0, 0, -0.707, 0.707],
        [10, 0, 0, -0.707, 0.707],
    ],
    renderer_extra={"raw_noise_std": 0.1, "blur_idx": 0},
)
