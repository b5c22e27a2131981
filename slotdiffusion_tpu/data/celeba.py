"""CelebA dataset (images only).

Rebuild of img_based/datasets/celeba.py:8-67: reads the standard CelebA
layout (`img_align_celeba/` + `list_eval_partition.txt` with split ids
0/1/2 = train/val/test); no masks.
"""

import os.path as osp

import numpy as np
from PIL import Image

from .loader import Dataset, SampleError
from .transforms import BaseTransforms

_SPLIT_ID = {"train": "0", "val": "1", "test": "2"}


class CelebADataset(Dataset):

    def __init__(self, data_root, resolution, split="train"):
        self.transforms = BaseTransforms(resolution)
        part_file = osp.join(data_root, "list_eval_partition.txt")
        img_dir = osp.join(data_root, "img_align_celeba")
        if not osp.isfile(part_file):
            raise FileNotFoundError(part_file)
        want = _SPLIT_ID[split]
        self.files = []
        with open(part_file) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2 and parts[1] == want:
                    self.files.append(osp.join(img_dir, parts[0]))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        try:
            img = Image.open(self.files[idx]).convert("RGB")
        except (FileNotFoundError, OSError) as e:
            raise SampleError(str(e))
        return {
            "data_idx": np.int32(idx),
            "img": self.transforms(img).astype(np.float32),
        }


def build_celeba_dataset(params, val_only=False):
    kw = dict(data_root=params.data_root, resolution=params.resolution)
    val = CelebADataset(split="val", **kw)
    if val_only:
        return val
    return CelebADataset(split="train", **kw), val
