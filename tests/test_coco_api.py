"""MiniCOCO (data/_coco_api.py): the pure-Python pycocotools fallback.

Validates the three segmentation encodings of the real instances_*.json
format (polygon / uncompressed RLE / compressed RLE string) and that
COCODataset runs over a format-true on-disk tree through the fallback
with NO pycocotools installed (this image has none — no monkeypatching
needed; reference format producer: pycocotools mask.c, consumer:
/root/reference/slotdiffusion/img_based/datasets/coco.py:243-288)."""

import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from slotdiffusion_tpu.data._coco_api import (
    MiniCOCO, decode_rle_string, encode_rle_string, mask_to_rle,
    polygons_to_mask, rle_to_mask)


def test_rle_string_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = rng.randint(1, 40)
        counts = rng.randint(0, 5000, n).tolist()
        assert decode_rle_string(encode_rle_string(counts)) == counts
    # degenerate + large-value cases
    for counts in ([0], [0, 12345678], [5], [0, 1, 0, 1, 0, 1]):
        assert decode_rle_string(encode_rle_string(counts)) == counts


def test_mask_rle_roundtrip_column_major():
    # hand example: 3x2, column-major traversal is (0,0),(1,0),(2,0),(0,1)..
    m = np.array([[0, 1],
                  [1, 1],
                  [0, 0]], bool)
    counts = mask_to_rle(m)
    assert counts == [1, 1, 1, 2, 1]  # col0: 0,1,0 -> runs 1/1/1; col1: 1,1,0
    np.testing.assert_array_equal(rle_to_mask(counts, (3, 2)), m)

    rng = np.random.RandomState(1)
    for _ in range(10):
        m = rng.rand(17, 23) > 0.5
        np.testing.assert_array_equal(
            rle_to_mask(mask_to_rle(m), m.shape), m)


def test_polygon_rectangle_exact():
    # PIL fills a rectangle polygon inclusive of its boundary
    mask = polygons_to_mask([[3, 2, 10, 2, 10, 8, 3, 8]], (12, 14))
    exp = np.zeros((12, 14), np.uint8)
    exp[2:9, 3:11] = 1
    np.testing.assert_array_equal(mask, exp)


def _write_tree(root):
    H, W = 40, 60
    img_dir = root / "val2017"
    img_dir.mkdir()
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
        img_dir / "000000000001.jpg")
    rect = np.zeros((H, W), bool)
    rect[5:15, 10:30] = True
    annos = [
        # polygon instance
        dict(id=1, image_id=1, category_id=1,
             segmentation=[[10, 5, 29, 5, 29, 14, 10, 14]],
             bbox=[10, 5, 20, 10], area=200.0, iscrowd=0),
        # uncompressed-RLE instance
        dict(id=2, image_id=1, category_id=3,
             segmentation=dict(size=[H, W], counts=mask_to_rle(rect)),
             bbox=[10, 5, 20, 10], area=200.0, iscrowd=0),
        # compressed-RLE crowd (must be filtered by the dataset)
        dict(id=3, image_id=1, category_id=1,
             segmentation=dict(size=[H, W], counts=encode_rle_string(
                 mask_to_rle(rect))),
             bbox=[10, 5, 20, 10], area=200.0, iscrowd=1),
    ]
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(dict(
            images=[dict(id=1, file_name="000000000001.jpg",
                         height=H, width=W)],
            annotations=annos,
            categories=[dict(id=1, name="a"), dict(id=3, name="b")]), f)


def test_minicoco_all_encodings(tmp_path):
    _write_tree(tmp_path)
    coco = MiniCOCO(str(tmp_path / "annotations" /
                        "instances_val2017.json"))
    assert coco.getImgIds() == [1]
    assert sorted(coco.getCatIds()) == [1, 3]
    anns = coco.loadAnns(coco.getAnnIds(imgIds=1))
    assert len(anns) == 3
    m_poly, m_rle, m_crowd = (coco.annToMask(a) for a in anns)
    exp = np.zeros((40, 60), np.uint8)
    exp[5:15, 10:30] = 1
    np.testing.assert_array_equal(m_rle, exp)       # uncompressed RLE
    np.testing.assert_array_equal(m_crowd, exp)     # compressed RLE
    # polygon [10,5..29,14] inclusive -> rows 5..14, cols 10..29
    np.testing.assert_array_equal(m_poly, exp)


def test_cocodataset_runs_on_fallback(tmp_path):
    # guards the real import path: pycocotools absent in this image
    with pytest.raises(ImportError):
        import pycocotools  # noqa: F401
    _write_tree(tmp_path)
    from slotdiffusion_tpu.data.coco import COCODataset

    ds = COCODataset(str(tmp_path), resolution=(32, 32), split="val")
    s = ds[0]
    assert s["img"].shape == (32, 32, 3)
    # crowd filtered -> 2 instances; both paint the SAME rectangle so the
    # later anno fully overwrites the first (argmax painting) and
    # suppress_mask_idx renumbers the surviving id to 1
    assert s["inst_masks"].max() == 1
    painted = s["inst_masks"] > 0
    assert painted.sum() > 0
    np.testing.assert_array_equal(s["overlap_masks"], painted)
    assert set(np.unique(s["masks"][painted])) == {2}  # cat 3 -> label 2
    assert s["annos"].shape[1] == 5


def test_generator_tree_loads_end_to_end(tmp_path):
    """The gen_mini_seg_data.py COCO tree parses through the full
    dataset + collate path (the same tree the TPU drive trains on)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_mini_seg_data",
        osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "scripts", "data_utils", "gen_mini_seg_data.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    gen.gen_coco(str(tmp_path / "mini_coco"), 4, 2, 64, seed=0)
    gen.gen_voc(str(tmp_path / "mini_voc"), 8, 64, seed=0)

    from slotdiffusion_tpu.data.coco import COCODataset, coco_collate_fn
    from slotdiffusion_tpu.data.voc import build_voc_dataset
    from slotdiffusion_tpu.utils import BaseParams

    for split, n in (("train", 4), ("val", 2)):
        ds = COCODataset(str(tmp_path / "mini_coco"),
                         resolution=(48, 48), split=split)
        assert len(ds) == n
        batch = coco_collate_fn([ds[i] for i in range(n)])
        assert batch["img"].shape == (n, 48, 48, 3)
        assert batch["inst_masks"].max() >= 1  # objects present
        assert (batch["annos"][..., 4] >= 0).any()

    p = BaseParams()
    p.data_root = str(tmp_path / "mini_voc")
    p.resolution = (48, 48)
    train, val = build_voc_dataset(p)
    assert len(train) == 6 and len(val) == 2
    sv = val[0]
    # the 255-void ring must be mapped to background, instance ids
    # suppressed to contiguous
    assert 255 not in np.unique(sv["masks"])
    ids = np.unique(sv["inst_masks"])
    np.testing.assert_array_equal(ids, np.arange(len(ids)))
