"""Render driver (mirror of reference network/render.py:6-29): builds the
test dataset, model and renderer, then the Logger in eval mode — which
restores the checkpoint and immediately renders every dataset entry."""

from nerftex_tpu.utils import util
from nerftex_tpu.utils.util import EasyDict


def Render(
    target_path: str,
    test_dataset_config: EasyDict,
    model_config: EasyDict,
    renderer_config: EasyDict,
    logger_config: EasyDict,
    source_path: str = None,
    override: bool = True,
    **kwargs,
) -> None:
    test_dataset = util.instantiate(test_dataset_config)

    model_config = EasyDict(model_config)
    model_config.setdefault("n_parameters", test_dataset.n_parameters)
    models = util.instantiate(model_config)

    renderer_config = EasyDict(renderer_config)
    renderer_config.update(models)
    renderer = util.instantiate(renderer_config)

    logger_config = EasyDict(logger_config)
    logger_config.update(
        {
            "target_path": target_path,
            "checkpoint_variables": dict(models),
            "source_path": source_path,
            "dataset": test_dataset,
            "is_training": False,
            "renderer": renderer,
        }
    )
    util.instantiate(logger_config)
    return renderer
