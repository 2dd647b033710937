# End-to-end demo: the mip_importance extension (PARITY.md additions) —
# hierarchical fence-post resampling on the MipRenderer path.  The reference
# raises NotImplementedError for n_importance > 0 on its mip renderer
# (network/renderer.py:403-404); this config opts into the framework's
# working implementation on top of the prefiltered IPE demo: the coarse
# 64-segment march feeds a 64-post importance resample, and the AlphaLoss
# coarse terms supervise both levels exactly like the classic
# coarse/fine path.
import copy

from configs.demo_grass_mip_train import config as _base

config = copy.deepcopy(_base)
config["target_path"] = "logs/grass_mip_imp"
config["renderer_config"].update(
    {
        "n_importance": config["renderer_config"]["n_samples"],
        "mip_importance": True,
    }
)
