"""Parity guard for the shipped config surface (SURVEY.md §2.3).

Every config module must export a `config` dict with the reference schema
(configs/config_carpet_train.py:3-12) whose inner module trees instantiate
against this framework's implementations — models, losses, datasets (sans
TFRecords, which are generated artifacts), and the full instancer scene
build for every render config (meshes/ is committed).
"""

import copy
import glob
import importlib
import os

import numpy as np
import pytest

from nerftex_tpu.utils import util
from nerftex_tpu.utils.util import EasyDict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Non-reference config_* additions (PARITY.md "Additions beyond the
# reference"): schema-tested like everything else, but excluded from the
# reference-set completeness assertion below.
EXTRA_CONFIGS = ["config_carpet10k_render"]  # instance-count scale bench

ALL_CONFIGS = sorted(
    os.path.basename(p)[:-3]
    for p in glob.glob(os.path.join(REPO, "configs", "config_*.py"))
)
REF_CONFIGS = [n for n in ALL_CONFIGS if n not in EXTRA_CONFIGS]
DEMO_CONFIGS = sorted(
    os.path.basename(p)[:-3]
    for p in glob.glob(os.path.join(REPO, "configs", "demo_*.py"))
)
RENDER_CONFIGS = [n for n in REF_CONFIGS if n.endswith("_render")]


def _load(name):
    return copy.deepcopy(importlib.import_module(f"configs.{name}").config)


def test_reference_config_set_complete():
    # The reference ships exactly these nine (SURVEY.md §2.3).
    assert REF_CONFIGS == [
        "config_carpet_render",
        "config_carpet_train",
        "config_fur_train",
        "config_grass_filtered_render",
        "config_grass_filtered_train",
        "config_grass_render",
        "config_grass_train",
        "config_plush_render",
        "config_plush_train",
    ]


@pytest.mark.parametrize("name", ALL_CONFIGS + DEMO_CONFIGS)
def test_config_schema(name):
    cfg = _load(name)
    for key in ("module", "target_path", "seed"):
        assert key in cfg, f"{name} missing {key}"
    assert cfg["module"] in ("network.train.Train", "network.render.Render")
    if name.endswith("_train"):
        assert cfg["module"] == "network.train.Train"
        for key in ("train_dataset_config", "val_dataset_config", "model_config",
                    "loss_config", "n_iters", "lrate", "lrate_decay",
                    "renderer_config", "logger_config"):
            assert key in cfg, f"{name} missing {key}"
    else:
        assert cfg["module"] == "network.render.Render"
        for key in ("test_dataset_config", "model_config", "renderer_config",
                    "logger_config"):
            assert key in cfg, f"{name} missing {key}"
        assert "instancer_config" in cfg["renderer_config"]


@pytest.mark.parametrize("name", REF_CONFIGS)
def test_model_and_loss_instantiate(name):
    cfg = _load(name)
    models = util.instantiate(EasyDict(cfg["model_config"]))
    # Factories return {'model': Model} (CoarseFine adds 'model_fine').
    assert "model" in models
    for m in models.values():
        assert m.params  # initialized pytree
    if "loss_config" in cfg:
        loss = util.instantiate(EasyDict(cfg["loss_config"]))
        assert callable(loss)


@pytest.mark.parametrize("name", REF_CONFIGS)
def test_generated_datasets_instantiate(name):
    """The val/test dataset trees (GenerateData — no disk artifacts needed)
    build and yield one batch with the expected ray keys."""
    cfg = _load(name)
    key = "val_dataset_config" if name.endswith("_train") else "test_dataset_config"
    ds_cfg = EasyDict(cfg[key])
    ds = util.instantiate(ds_cfg)
    batch = next(iter(ds.take(1)))
    for k in ("rays_o", "rays_d", "t", "cone_scale", "parameters"):
        assert k in batch, f"{name}:{key} batch missing {k}"
    assert np.asarray(batch["rays_o"]).shape[-1] == 3


@pytest.mark.parametrize("name", RENDER_CONFIGS)
def test_render_instancer_builds(name, monkeypatch):
    """Full host scene build from the committed meshes/ assets: anchors,
    tangent frames, textures, transform counts."""
    monkeypatch.chdir(REPO)
    cfg = _load(name)
    inst_cfg = EasyDict(cfg["renderer_config"]["instancer_config"])
    inst = util.instantiate(inst_cfg)
    assert inst.n_instances() > 0
    origins = np.asarray(inst.scene.origins)
    assert origins.shape == (inst.n_instances(), 3)
    assert np.isfinite(origins).all()
