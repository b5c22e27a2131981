"""Physion video dataset (8 physical-reasoning scenarios).

Rebuild of video_based/datasets/physion.py: frame folders extracted from
mp4s, subset in {training, readout, test} with JSON split files mapping
task -> video list (:117-158); per-task video index bookkeeping for the VQA
breakdown; train split samples every valid start idx, val strided.

Split JSONs are looked up under `{data_root}/splits/` first, then the
package cache — the reference vendors them under datasets/splits/Physion.
"""

import os
import os.path as osp

import numpy as np
from PIL import Image, ImageFile

from ..utils.misc import load_obj
from .loader import Dataset, SampleError
from .transforms import BaseTransforms

ImageFile.LOAD_TRUNCATED_IMAGES = True

ALL_TASKS = ["Collide", "Contain", "Dominoes", "Drape", "Drop", "Link",
             "Roll", "Support"]


def _find_split_file(data_root, subset, split):
    cands = [
        osp.join(data_root, "splits", f"{subset}_{split}.json"),
        osp.join(data_root, "splits", "Physion", f"{subset}_{split}.json"),
        osp.join(os.environ.get("SLOTDIFFUSION_CACHE",
                                osp.expanduser("~/.cache/slotdiffusion_tpu")),
                 "splits", "Physion", f"{subset}_{split}.json"),
    ]
    for c in cands:
        if osp.isfile(c):
            return c
    raise FileNotFoundError(
        f"Physion split file {subset}_{split}.json not found in {cands}")


class PhysionDataset(Dataset):

    def __init__(self, data_root, resolution, split="train", tasks=("all",),
                 n_sample_frames=6, frame_offset=1, video_len=150,
                 subset="training"):
        if subset in ("training", "readout"):
            assert split in ("train", "val")
        elif subset == "test":
            assert split == "test"
        else:
            raise ValueError(f"unknown subset {subset}")
        self.data_root = data_root
        self.split = split
        self.subset = subset
        self.transforms = BaseTransforms(resolution)
        self.n_sample_frames = n_sample_frames
        self.frame_offset = frame_offset or 1
        self.video_len = video_len
        self.load_video = False

        json_file = load_obj(_find_split_file(data_root, subset, split))
        self.all_tasks = sorted(json_file.keys())
        self.task2num = {t: len(json_file[t]) for t in self.all_tasks}
        tasks = list(tasks)
        if tasks[0].lower() == "all":
            tasks = list(json_file.keys())
        self.tasks = tasks
        self.files = []
        self.video_idx2task_idx = {}
        for task in tasks:
            i1 = len(self.files)
            self.files += [osp.join(data_root, f[:-4])
                           for f in json_file[task]]  # strip '.mp4'
            for i in range(i1, len(self.files)):
                self.video_idx2task_idx[i] = self.all_tasks.index(task)
        self.num_videos = len(self.files)
        self.valid_idx = self._index_clips()

    def _index_clips(self):
        valid = []
        span = (self.n_sample_frames - 1) * self.frame_offset
        if self.split == "train":
            for folder in self.files:
                valid += [(folder, s) for s in range(self.video_len - span)]
        else:
            size = self.n_sample_frames * self.frame_offset
            for folder in self.files:
                starts = []
                for idx in range(0, self.video_len - size + 1, size):
                    starts += [idx + i for i in range(self.frame_offset)]
                valid += [(folder, s) for s in starts]
        return valid

    def _read_clip(self, folder, start, num):
        frames = []
        for n in range(num):
            path = osp.join(folder,
                            f"{start + n * self.frame_offset:06d}.jpg")
            try:
                frames.append(self.transforms.load_image(path))
            except (FileNotFoundError, OSError) as e:
                raise SampleError(str(e))
        return np.stack(frames).astype(np.float32)

    def get_video(self, video_idx):
        num = self.video_len // self.frame_offset
        img = self._read_clip(self.files[video_idx], 0, num)
        return {"video": img, "img": img, "data_idx": np.int32(video_idx)}

    def __len__(self):
        if self.load_video:
            return len(self.files)
        return len(self.valid_idx)

    def __getitem__(self, idx):
        if self.load_video:
            return self.get_video(idx)
        folder, start = self.valid_idx[idx]
        return {
            "data_idx": np.int32(idx),
            "img": self._read_clip(folder, start, self.n_sample_frames),
        }


def build_physion_dataset(params, val_only=False):
    subset = params.dataset.split("_")[-1]
    if subset not in ("training", "readout", "test"):
        subset = params.get("subset", "training")
    kw = dict(
        data_root=params.data_root,
        resolution=params.resolution,
        tasks=list(params.get("tasks", ["all"])),
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.get("frame_offset", 1),
        video_len=params.get("video_len", 150),
        subset=subset,
    )
    if subset == "test":
        return PhysionDataset(split="test", **kw)
    val = PhysionDataset(split="val", **kw)
    if val_only:
        return val
    train = PhysionDataset(split="train", **kw)
    return train, val
