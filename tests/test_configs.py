"""Every shipped config must load and build its model.

The reference's config surface (38 files across img_based/video_based/
vp_vqa) is mirrored under configs/; this test is the contract that
`load_params` + `build_model` accept each of them. (Dataset construction
needs data on disk and is exercised by the synthetic configs elsewhere.)
"""

import glob
import os.path as osp

import pytest

from slotdiffusion_tpu.models import build_model
from slotdiffusion_tpu.utils.config import load_params

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
CONFIGS = sorted(glob.glob(osp.join(ROOT, "configs", "**", "*params*.py"),
                           recursive=True))


def test_config_inventory():
    # 38 reference configs + the synthetic smoke config
    assert len(CONFIGS) >= 39


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[osp.basename(p) for p in CONFIGS])
def test_config_builds_model(path):
    params = load_params(path)
    assert params.get("model"), path
    assert params.get("dataset"), path
    model = build_model(params)
    assert model is not None
    # trainer-facing attrs every config must define
    for attr in ("lr", "max_epochs", "train_batch_size", "val_batch_size"):
        assert params.get(attr) is not None, (path, attr)
