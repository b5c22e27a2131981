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


def test_train_cli_set_overrides():
    """scripts/train.py --set KEY=VALUE: literals parse, strings fall
    back, malformed pairs error (the reference mutates params post-load
    in its eval scripts; --set is the CLI analog)."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "train_cli", osp.join(ROOT, "scripts", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_cli"] = spec.loader.exec_module(mod) or mod

    from slotdiffusion_tpu.utils.config import BaseParams

    p = BaseParams()
    mod.apply_overrides(p, ["loader_worker_mode=process", "lr=5e-4",
                            "grad_accum_steps=2", "use_ema=False",
                            "resolution=(32, 32)"])
    assert p.loader_worker_mode == "process"  # bare word -> string
    assert p.lr == 5e-4 and p.grad_accum_steps == 2
    assert p.use_ema is False and p.resolution == (32, 32)
    with pytest.raises(ValueError):
        mod.apply_overrides(p, ["no_equals_sign"])
