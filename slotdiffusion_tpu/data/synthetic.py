"""Synthetic datasets for tests, benchmarks, and dry-runs.

The reference trains on external datasets (CLEVRTex/CelebA/MOVi/COCO/VOC/
Physion, docs/data.md) which are not shipped; these procedurally generated
scenes provide the same sample dict contract (`img` in [-1, 1], optional int
`masks`) so every model/trainer/eval path can run end-to-end without data on
disk. Scenes contain colored geometric objects on a textured background, so
slot models have real structure to discover.
"""

from typing import Optional, Tuple

import numpy as np

from .loader import Dataset


def _render_scene(rng, resolution, max_objects=4):
    """Render a simple scene: gradient background + colored squares/circles.

    Returns (img float32 [H, W, 3] in [0, 1], mask int32 [H, W]).
    """
    H, W = resolution
    # background gradient
    gy = np.linspace(0, 1, H)[:, None]
    gx = np.linspace(0, 1, W)[None, :]
    bg_color = rng.rand(3) * 0.4
    img = np.zeros((H, W, 3), np.float32)
    for c in range(3):
        img[..., c] = bg_color[c] + 0.2 * (gy * rng.rand() + gx * rng.rand())
    mask = np.zeros((H, W), np.int32)
    n_obj = rng.randint(1, max_objects + 1)
    ys, xs = np.mgrid[0:H, 0:W]
    for i in range(n_obj):
        color = 0.4 + 0.6 * rng.rand(3)
        size = rng.randint(max(H // 8, 3), max(H // 3, 5))
        cy = rng.randint(0, H)
        cx = rng.randint(0, W)
        if rng.rand() < 0.5:  # square
            sel = (np.abs(ys - cy) < size // 2) & (np.abs(xs - cx) < size // 2)
        else:  # circle
            sel = (ys - cy) ** 2 + (xs - cx) ** 2 < (size // 2) ** 2
        img[sel] = color
        mask[sel] = i + 1
    return np.clip(img, 0.0, 1.0), mask


class SyntheticImageDataset(Dataset):
    """Images of colored shapes; sample dict matches CLEVRTex-style datasets:
    {'img': [-1,1] float32 [H, W, 3], 'masks': int32 [H, W], 'data_idx'}."""

    def __init__(self, resolution=(64, 64), num_samples=128, max_objects=4,
                 load_mask=True, seed=0):
        self.resolution = tuple(resolution)
        self.num_samples = num_samples
        self.max_objects = max_objects
        self.load_mask = load_mask
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed * 100003 + idx)
        img, mask = _render_scene(rng, self.resolution, self.max_objects)
        out = {
            "img": (img * 2.0 - 1.0).astype(np.float32),
            "data_idx": np.int32(idx),
        }
        if self.load_mask:
            out["masks"] = mask
        return out


class SyntheticCOCODataset(Dataset):
    """COCO-shaped synthetic images: sample dict matches COCODataset
    (coco.py) exactly — {'img', 'masks' (semantic: category id, square=1 /
    circle=2), 'inst_masks' (instance, id-suppressed paint order),
    'overlap_masks' (pixels covered by >1 instance), 'annos' [N, 5]
    variable-length} — so the img_based COCO dual inst/sem eval protocol
    (reference img_based/test_seg.py:45-89) can be driven end-to-end with
    no data on disk."""

    def __init__(self, resolution=(64, 64), num_samples=64, max_objects=4,
                 load_anno=True, seed=0):
        self.resolution = tuple(resolution)
        self.num_samples = num_samples
        self.max_objects = max_objects
        self.load_anno = load_anno
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed * 100003 + idx)
        H, W = self.resolution
        gy = np.linspace(0, 1, H)[:, None]
        gx = np.linspace(0, 1, W)[None, :]
        bg_color = rng.rand(3) * 0.4
        img = np.zeros((H, W, 3), np.float32)
        for c in range(3):
            img[..., c] = bg_color[c] + 0.2 * (gy * rng.rand()
                                               + gx * rng.rand())
        inst = np.zeros((H, W), np.int32)
        sem = np.zeros((H, W), np.int32)
        paint_count = np.zeros((H, W), np.int32)
        n_obj = rng.randint(1, self.max_objects + 1)
        ys, xs = np.mgrid[0:H, 0:W]
        boxes = []
        for i in range(n_obj):
            color = 0.4 + 0.6 * rng.rand(3)
            size = rng.randint(max(H // 8, 3), max(H // 3, 5))
            cy = rng.randint(0, H)
            cx = rng.randint(0, W)
            square = rng.rand() < 0.5
            if square:
                sel = (np.abs(ys - cy) < size // 2) & \
                      (np.abs(xs - cx) < size // 2)
            else:
                sel = (ys - cy) ** 2 + (xs - cx) ** 2 < (size // 2) ** 2
            if not sel.any():
                continue
            img[sel] = color
            # later annos overwrite earlier ones (coco.py paint order)
            inst[sel] = len(boxes) + 1
            sem[sel] = 1 if square else 2
            paint_count[sel] += 1
            sy, sx = np.nonzero(sel)
            boxes.append([sx.min(), sy.min(), sx.max() + 1, sy.max() + 1,
                          0 if square else 1])
        out = {
            "data_idx": np.int32(idx),
            "img": (np.clip(img, 0, 1) * 2.0 - 1.0).astype(np.float32),
        }
        if self.load_anno:
            from .transforms import suppress_mask_idx
            out["masks"] = sem
            out["inst_masks"] = suppress_mask_idx(inst)
            out["overlap_masks"] = (paint_count > 1).astype(np.int32)
            out["annos"] = np.asarray(boxes, np.float32).reshape(-1, 5)
        return out


class SyntheticVideoDataset(Dataset):
    """Videos of shapes drifting with constant velocity; sample dict matches
    MOVi-style datasets: {'img': [T, H, W, 3], 'masks': [T, H, W]}."""

    def __init__(self, resolution=(64, 64), num_samples=64,
                 n_sample_frames=3, max_objects=4, load_mask=True, seed=0):
        self.resolution = tuple(resolution)
        self.num_samples = num_samples
        self.n_frames = n_sample_frames
        self.max_objects = max_objects
        self.load_mask = load_mask
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed * 100003 + idx)
        H, W = self.resolution
        n_obj = rng.randint(1, self.max_objects + 1)
        colors = 0.4 + 0.6 * rng.rand(n_obj, 3)
        sizes = rng.randint(max(H // 8, 3), max(H // 3, 5), size=n_obj)
        pos = rng.rand(n_obj, 2) * [H, W]
        vel = (rng.rand(n_obj, 2) - 0.5) * H * 0.1
        bg_color = rng.rand(3) * 0.4
        ys, xs = np.mgrid[0:H, 0:W]
        frames, masks = [], []
        for t in range(self.n_frames):
            img = np.tile(bg_color[None, None].astype(np.float32), (H, W, 1))
            mask = np.zeros((H, W), np.int32)
            for i in range(n_obj):
                cy, cx = pos[i] + vel[i] * t
                sel = (np.abs(ys - cy) < sizes[i] // 2) & \
                      (np.abs(xs - cx) < sizes[i] // 2)
                img[sel] = colors[i]
                mask[sel] = i + 1
            frames.append(np.clip(img, 0, 1))
            masks.append(mask)
        out = {
            "img": (np.stack(frames) * 2.0 - 1.0).astype(np.float32),
            "data_idx": np.int32(idx),
        }
        if self.load_mask:
            out["masks"] = np.stack(masks)
        return out
