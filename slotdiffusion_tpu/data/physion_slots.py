"""Physion pre-computed slots datasets (vp_vqa stage).

Rebuild of vp_vqa/datasets/physion.py:166-455:
- `PhysionSlotsDataset`: reads per-video slot arrays from the pkl written by
  extract_slots ({split: {video_name: [T, N, C]}}), aligned to video frame
  indexing (:166-231)
- `PhysionSlotsLabelDataset`: adds binary VQA labels parsed from the
  readout/test label CSVs, bad-stimuli filtering on the test set (:234-354)

CSV parsing uses the stdlib (the reference uses pandas) — the label file has
a leading unnamed index column and a 'ground truth outcome' column.
"""

import csv
import os
import os.path as osp

import numpy as np

from ..utils.misc import load_obj, read_all_lines
from .loader import Dataset, SampleError
from .physion import PhysionDataset


def _load_label_csv(path):
    """-> {stimulus_name: 0/1} from the Physion label CSV."""
    labels = {}
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        gt_col = header.index("ground truth outcome")
        for row in reader:
            key = row[0]
            val = row[gt_col].strip().lower()
            labels[key] = 1 if val in ("true", "1", "yes") else 0
    return labels


class PhysionSlotsDataset(PhysionDataset):
    """Clips of pre-computed slots (+ optionally frames)."""

    def __init__(self, data_root, video_slots, resolution, split="train",
                 tasks=("all",), n_sample_frames=25, frame_offset=1,
                 video_len=150, subset="training", load_img=False):
        super().__init__(
            data_root=data_root, resolution=resolution, split=split,
            tasks=tasks, n_sample_frames=n_sample_frames,
            frame_offset=frame_offset, video_len=video_len, subset=subset)
        self.video_slots = video_slots
        self.load_img = load_img

    def _read_slots(self, folder, start, num):
        name = osp.basename(folder)
        if name not in self.video_slots:
            raise SampleError(f"no slots for video {name}")
        slots = self.video_slots[name]  # [T, N, C]
        try:
            picked = [slots[start + n * self.frame_offset]
                      for n in range(num)]
        except IndexError as e:
            raise SampleError(str(e))
        return np.stack(picked).astype(np.float32)

    def __getitem__(self, idx):
        folder, start = self.valid_idx[idx]
        out = {
            "data_idx": np.int32(idx),
            "slots": self._read_slots(folder, start, self.n_sample_frames),
        }
        if self.load_img:
            out["img"] = self._read_clip(folder, start, self.n_sample_frames)
        return out


class PhysionSlotsLabelDataset(PhysionSlotsDataset):
    """(whole-video slots, VQA label) pairs."""

    def __init__(self, data_root, video_slots, resolution, split="train",
                 tasks=("all",), n_sample_frames=15, frame_offset=1,
                 video_len=150, subset="readout", load_img=False):
        assert frame_offset in (None, 1)
        if subset == "readout":
            label_fn = osp.join(data_root, "PhysionTrainMP4s",
                                "readout_labels.csv")
        elif subset == "test":
            label_fn = osp.join(data_root, "PhysionTestMP4s", "labels.csv")
        else:
            raise ValueError(subset)
        self.labels = _load_label_csv(label_fn)
        super().__init__(
            data_root=data_root, video_slots=video_slots,
            resolution=resolution, split=split, tasks=tasks,
            n_sample_frames=n_sample_frames, frame_offset=1,
            video_len=video_len, subset=subset, load_img=load_img)
        self.sample_idx = list(range(video_len))
        if subset == "test":
            # drop bad stimuli (vp_vqa/datasets/physion.py:294-305)
            bad_path = osp.join(data_root, "splits", "bad_stimuli.txt")
            if osp.isfile(bad_path):
                bad = read_all_lines(bad_path)
                keep = []
                for f in self.files:
                    check = f.replace("-redyellow", "")
                    if not any(s in check for s in bad):
                        keep.append(f)
                self.files = keep

    def _read_label(self, file_idx):
        key = osp.basename(self.files[file_idx])
        if key.endswith(".mp4"):
            key = key[:-4]
        if self.subset == "readout" and key.endswith("_img"):
            key = key[:-4]
        if self.subset == "test" and "-redyellow" in key:
            key = key.replace("-redyellow", "")
        if key not in self.labels:
            raise SampleError(f"no label for {key}")
        return np.int32(self.labels[key])

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        folder = self.files[idx]
        name = osp.basename(folder)
        if name not in self.video_slots:
            raise SampleError(f"no slots for video {name}")
        slots = self.video_slots[name]
        try:
            picked = np.stack([slots[i] for i in self.sample_idx])
        except IndexError as e:
            raise SampleError(str(e))
        out = {
            "data_idx": np.int32(idx),
            "task_idx": np.int32(self.video_idx2task_idx[idx]),
            "slots": picked.astype(np.float32),
            "label": self._read_label(idx),
        }
        if self.load_img:
            out["img"] = self._read_clip(folder, 0, len(self.sample_idx))
        return out


def build_physion_slots_dataset(params, val_only=False):
    """Builders for slots / slots+label datasets
    (vp_vqa/datasets/physion.py:357-455)."""
    slots_path = params.slots_root
    video_slots = load_obj(slots_path)
    name = params.dataset
    tail = name.split("_")[-1]
    if tail in ("training", "readout", "test"):
        subset = tail
    else:
        subset = params.get("subset", "readout" if "label" in name or
                            "readout" in name else "training")
    common = dict(
        data_root=params.data_root,
        resolution=params.resolution,
        tasks=list(params.get("tasks", ["all"])),
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.get("frame_offset", 1),
        video_len=params.get("video_len", 150),
        load_img=params.get("load_img", False),
    )
    cls = PhysionSlotsLabelDataset if ("label" in name or "readout" in name) \
        else PhysionSlotsDataset
    if subset == "test":
        return cls(video_slots=video_slots.get("test", video_slots),
                   split="test", subset="test", **common)
    val = cls(video_slots=video_slots.get("val", video_slots),
              split="val", subset=subset, **common)
    if val_only:
        return val
    train = cls(video_slots=video_slots.get("train", video_slots),
                split="train", subset=subset, **common)
    return train, val
