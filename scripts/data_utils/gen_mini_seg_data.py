"""Generate miniature but FORMAT-TRUE COCO-2017 and VOC-2012 trees.

Writes the exact on-disk formats the reference consumes
(img_based/datasets/coco.py:243-288, voc.py) so the COCO/VOC data + eval
path can be driven end-to-end from real files in an environment where the
full datasets cannot be downloaded:

- COCO: {root}/train2017/*.jpg, {root}/val2017/*.jpg,
  {root}/annotations/instances_{split}2017.json with POLYGON
  segmentations for instances, bbox/area/iscrowd fields, and one
  compressed-RLE crowd annotation per split (exercising the
  crowd-filter + the RLE branch of the JSON format);
- VOC: {root}/JPEGImages/*.jpg, ImageSets/Segmentation/{trainaug,val}.txt,
  SegmentationClass(Aug)/SegmentationObject palettized "P"-mode PNGs with
  the real VOC 255-void boundary ring around every object.

Scenes are 1-4 bright shapes (rectangle / triangle / hexagon, category =
shape type) on a dark noisy background — learnable by a small SA model in
a few hundred steps, so the generated trees support a short training run
followed by the dual instance+semantic test_seg protocol.

Usage:
    python scripts/data_utils/gen_mini_seg_data.py \
        --out data_local --coco_train 128 --coco_val 32 --voc 96 --res 96
"""

import argparse
import json
import os
import os.path as osp

import sys

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from slotdiffusion_tpu.data._coco_api import (  # noqa: E402
    encode_rle_string, mask_to_rle)


def _shape_polygon(rng, H, W, kind):
    """Random polygon of the given kind inside [0,W)x[0,H)."""
    size = rng.randint(min(H, W) // 5, min(H, W) // 2)
    cx = rng.randint(size // 2 + 1, W - size // 2 - 1)
    cy = rng.randint(size // 2 + 1, H - size // 2 - 1)
    r = size / 2
    if kind == 0:  # rectangle
        pts = [(cx - r, cy - r), (cx + r, cy - r),
               (cx + r, cy + r), (cx - r, cy + r)]
    elif kind == 1:  # triangle
        pts = [(cx, cy - r), (cx + r, cy + r), (cx - r, cy + r)]
    else:  # hexagon
        ang = np.linspace(0, 2 * np.pi, 7)[:6] + rng.rand() * np.pi
        pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in ang]
    return [(round(float(x), 1), round(float(y), 1)) for x, y in pts]


def _render_scene(rng, H, W, max_objects=4):
    """-> (img uint8 [H,W,3], list of (kind, polygon, mask bool[H,W]))."""
    img = Image.fromarray(
        (rng.rand(H, W, 3) * 40).astype(np.uint8))  # dark noise bg
    draw = ImageDraw.Draw(img)
    objs = []
    for _ in range(rng.randint(1, max_objects + 1)):
        kind = rng.randint(0, 3)
        pts = _shape_polygon(rng, H, W, kind)
        color = tuple(int(c) for c in rng.randint(120, 256, 3))
        draw.polygon(pts, fill=color, outline=color)
        m = Image.new("1", (W, H), 0)
        ImageDraw.Draw(m).polygon(pts, fill=1, outline=1)
        objs.append((kind, pts, np.asarray(m, bool)))
    return np.asarray(img, np.uint8), objs


def gen_coco(root, n_train, n_val, res, seed=0):
    H = W = res
    cats = [dict(id=1, name="rectangle", supercategory="shape"),
            dict(id=2, name="triangle", supercategory="shape"),
            dict(id=3, name="hexagon", supercategory="shape")]
    for split, n, seed_off in (("train", n_train, 0), ("val", n_val, 1)):
        img_dir = osp.join(root, f"{split}2017")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(osp.join(root, "annotations"), exist_ok=True)
        images, annos, aid = [], [], 1
        for i in range(n):
            rng = np.random.RandomState(seed * 7 + seed_off * 1000003 + i)
            img, objs = _render_scene(rng, H, W)
            name = f"{seed_off * 100000 + i:012d}.jpg"
            Image.fromarray(img).save(osp.join(img_dir, name), quality=95)
            img_id = seed_off * 100000 + i
            images.append(dict(id=img_id, file_name=name,
                               height=H, width=W))
            for kind, pts, m in objs:
                xs = [p[0] for p in pts]
                ys = [p[1] for p in pts]
                x0, y0 = min(xs), min(ys)
                bw, bh = max(xs) - x0, max(ys) - y0
                annos.append(dict(
                    id=aid, image_id=img_id, category_id=kind + 1,
                    segmentation=[[v for p in pts for v in p]],
                    bbox=[x0, y0, bw, bh], area=float(m.sum()), iscrowd=0))
                aid += 1
            if i == 0:  # one compressed-RLE crowd anno per split
                crowd = np.zeros((H, W), bool)
                crowd[:H // 8, :W // 8] = True
                annos.append(dict(
                    id=aid, image_id=img_id, category_id=1,
                    segmentation=dict(
                        size=[H, W],
                        counts=encode_rle_string(mask_to_rle(crowd))),
                    bbox=[0, 0, W // 8, H // 8],
                    area=float(crowd.sum()), iscrowd=1))
                aid += 1
        with open(osp.join(root, "annotations",
                           f"instances_{split}2017.json"), "w") as f:
            json.dump(dict(info=dict(description="mini-coco synthetic"),
                           images=images, annotations=annos,
                           categories=cats), f)
    print(f"COCO tree at {root}: {n_train} train / {n_val} val")


# the real VOC-2012 PNG palette (class index -> color); index 255 = void
def _voc_palette():
    pal = np.zeros((256, 3), np.uint8)
    for i in range(256):
        c, j = i, 0
        while c:
            pal[i, 0] |= ((c >> 0) & 1) << (7 - j)
            pal[i, 1] |= ((c >> 1) & 1) << (7 - j)
            pal[i, 2] |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
            j += 1
    return pal.flatten().tolist()


def _save_palette_png(arr, path):
    im = Image.fromarray(arr.astype(np.uint8), mode="P")
    im.putpalette(_voc_palette())
    im.save(path)


def gen_voc(root, n, res, seed=0):
    H = W = res
    for d in ("JPEGImages", "SegmentationClass", "SegmentationClassAug",
              "SegmentationObject", "ImageSets/Segmentation"):
        os.makedirs(osp.join(root, d), exist_ok=True)
    names = []
    for i in range(n):
        rng = np.random.RandomState(seed * 13 + 31 + i)
        img, objs = _render_scene(rng, H, W)
        name = f"2012_{i:06d}"
        names.append(name)
        Image.fromarray(img).save(
            osp.join(root, "JPEGImages", name + ".jpg"), quality=95)
        sem = np.zeros((H, W), np.uint8)
        inst = np.zeros((H, W), np.uint8)
        for j, (kind, _, m) in enumerate(objs):
            # 255-void boundary ring, as in real VOC annotations
            er = m & np.roll(m, 1, 0) & np.roll(m, -1, 0) & \
                np.roll(m, 1, 1) & np.roll(m, -1, 1)
            ring = m & ~er
            sem[m] = kind + 1  # classes 1..3 of the 20
            sem[ring] = 255
            inst[m] = j + 1
            inst[ring] = 255
        _save_palette_png(sem, osp.join(root, "SegmentationClass",
                                        name + ".png"))
        _save_palette_png(sem, osp.join(root, "SegmentationClassAug",
                                        name + ".png"))
        _save_palette_png(inst, osp.join(root, "SegmentationObject",
                                         name + ".png"))
    n_val = max(1, n // 4)
    sets = osp.join(root, "ImageSets", "Segmentation")
    with open(osp.join(sets, "trainaug.txt"), "w") as f:
        f.write("\n".join(names[n_val:]) + "\n")
    with open(osp.join(sets, "val.txt"), "w") as f:
        f.write("\n".join(names[:n_val]) + "\n")
    print(f"VOC tree at {root}: {n - n_val} trainaug / {n_val} val")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data_local")
    ap.add_argument("--coco_train", type=int, default=128)
    ap.add_argument("--coco_val", type=int, default=32)
    ap.add_argument("--voc", type=int, default=96)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    gen_coco(osp.join(args.out, "mini_coco"), args.coco_train,
             args.coco_val, args.res, args.seed)
    gen_voc(osp.join(args.out, "mini_voc"), args.voc, args.res, args.seed)


if __name__ == "__main__":
    main()
