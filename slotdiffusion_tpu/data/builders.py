"""Dataset dispatch by `params.dataset`.

Real datasets (CLEVRTex/CelebA/MOVi/Physion/COCO/VOC) load from
`params.data_root` when present on disk; the `synthetic` family needs no
data and powers tests/benchmarks/smoke runs.
"""

import os


def build_dataset(params, val_only=False):
    name = params.dataset

    if name == "synthetic":
        from .synthetic import SyntheticImageDataset
        res = tuple(params.resolution)
        val_set = SyntheticImageDataset(
            resolution=res, num_samples=params.get("val_samples", 64),
            max_objects=params.get("max_objects", 4),
            load_mask=params.get("load_mask", True), seed=1)
        if val_only:
            return val_set
        train_set = SyntheticImageDataset(
            resolution=res, num_samples=params.get("train_samples", 512),
            max_objects=params.get("max_objects", 4),
            load_mask=params.get("load_mask", True), seed=0)
        return train_set, val_set

    if name == "synthetic_video":
        from .synthetic import SyntheticVideoDataset
        res = tuple(params.resolution)
        kw = dict(
            resolution=res,
            n_sample_frames=params.get("n_sample_frames", 3),
            max_objects=params.get("max_objects", 4),
            load_mask=params.get("load_mask", True))
        val_set = SyntheticVideoDataset(
            num_samples=params.get("val_samples", 32), seed=1, **kw)
        if val_only:
            return val_set
        train_set = SyntheticVideoDataset(
            num_samples=params.get("train_samples", 256), seed=0, **kw)
        return train_set, val_set

    if name == "synthetic_coco":
        from .coco import coco_collate_fn
        from .synthetic import SyntheticCOCODataset
        kw = dict(resolution=tuple(params.resolution),
                  max_objects=params.get("max_objects", 4),
                  load_anno=params.get("load_anno", True))
        val_set = SyntheticCOCODataset(
            num_samples=params.get("val_samples", 64), seed=1, **kw)
        if val_only:
            return val_set
        train_set = SyntheticCOCODataset(
            num_samples=params.get("train_samples", 512), seed=0, **kw)
        return train_set, val_set, coco_collate_fn

    if name == "synthetic_video_slots":
        from ..utils.misc import load_obj
        from .synthetic_slots import SyntheticVideoSlotsDataset
        all_slots = load_obj(params.slots_root)
        kw = dict(
            resolution=tuple(params.resolution),
            video_len=params.get("video_len", 8),
            max_objects=params.get("max_objects", 4),
            load_img=params.get("load_img", False))
        # extraction seeds: train split seed 0, val/test seed 1
        # (synthetic.py SyntheticVideoDataset seeds in builders above)
        val_split = all_slots.get("val", all_slots.get("test"))
        if val_split is None:
            raise ValueError(
                "synthetic_video_slots: slots pkl at "
                f"{params.slots_root!r} has neither a 'val' nor a 'test' "
                f"split (found {sorted(all_slots)}); re-extract with "
                "scripts/extract_slots.py which writes both")
        val_set = SyntheticVideoSlotsDataset(val_split, seed=1, **kw)
        if val_only:
            return val_set
        train_set = SyntheticVideoSlotsDataset(
            all_slots["train"], seed=0, **kw)
        return train_set, val_set

    if name == "synthetic_rollout_slots":
        from ..utils.misc import load_obj
        from .synthetic_slots import SyntheticRolloutSlotsDataset
        all_slots = load_obj(params.rollout_root)
        meta = all_slots.pop("_meta", None)
        if meta is not None and meta.get("max_objects", -1) != -1 and \
                meta["max_objects"] != params.get("max_objects", 4):
            raise ValueError(
                f"rollout pkl {params.rollout_root!r} was produced from "
                f"videos rendered with max_objects={meta['max_objects']} "
                f"(config {meta.get('params')}), but this config sets "
                f"max_objects={params.get('max_objects', 4)} — the VQA "
                "label RNG would silently diverge from the rendered scenes")
        kw = dict(max_objects=params.get("max_objects", 4))
        # extraction/render seeds: train 0, val/test 1 (see above)
        test_split = all_slots.get("test", all_slots.get("val"))
        if test_split is None:
            raise ValueError(
                "synthetic_rollout_slots: rollout pkl at "
                f"{params.rollout_root!r} has neither a 'test' nor a 'val' "
                f"split (found {sorted(all_slots)}); re-run "
                "scripts/rollout_physion_slots.py to regenerate it")
        if val_only:
            return SyntheticRolloutSlotsDataset(test_split, seed=1, **kw)
        train_set = SyntheticRolloutSlotsDataset(
            all_slots["train"], seed=0, **kw)
        val_set = SyntheticRolloutSlotsDataset(
            all_slots.get("val", test_split), seed=1, **kw)
        return train_set, val_set

    if name == "synthetic_slots":
        from .synthetic_slots import SyntheticSlotsDataset
        for d in ("slot_dict", "rollout_dict", "readout_dict"):
            cfg = params.get(d)
            if cfg:
                break
        kw = dict(
            num_slots=cfg["num_slots"],
            slot_size=cfg["slot_size"],
            video_len=params.get("video_len", 16),
            with_labels=params.get("with_labels", False))
        val_set = SyntheticSlotsDataset(
            num_samples=params.get("val_samples", 32), seed=1, **kw)
        if val_only:
            return val_set
        train_set = SyntheticSlotsDataset(
            num_samples=params.get("train_samples", 256), seed=0, **kw)
        return train_set, val_set

    if name == "clevrtex":
        from .clevrtex import build_clevrtex_dataset
        return build_clevrtex_dataset(params, val_only=val_only)
    if name == "celeba":
        from .celeba import build_celeba_dataset
        return build_celeba_dataset(params, val_only=val_only)
    if name in ("movi", "steve_movi"):
        from .movi import build_movi_dataset
        return build_movi_dataset(params, val_only=val_only)
    # reference dataset-name forms: 'physion_training' (savi_ldm configs),
    # 'physion_slots_training' (slotformer), 'physion_slots_label_readout' /
    # 'physion_slots_label_test' (readout / VQA eval)
    if name.startswith("physion_slots") or name == "physion_slots":
        from .physion_slots import build_physion_slots_dataset
        return build_physion_slots_dataset(params, val_only=val_only)
    if name == "physion" or name.startswith("physion_"):
        from .physion import build_physion_dataset
        return build_physion_dataset(params, val_only=val_only)
    if name == "coco":
        from .coco import build_coco_dataset
        return build_coco_dataset(params, val_only=val_only)
    if name == "voc":
        from .voc import build_voc_dataset
        return build_voc_dataset(params, val_only=val_only)
    raise ValueError(f"unknown dataset {name!r}")
