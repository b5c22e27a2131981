"""Synthetic slot-trajectory datasets for SlotFormer/readout tests.

Generates smooth per-slot latent trajectories (sum of low-frequency
sinusoids) so SlotFormer's rollout training/eval paths run without real
extracted slots; the labeled variant emits a deterministic binary label for
readout training.

`SyntheticVideoSlotsDataset` is the synthetic analog of the Physion slots
dataset (physion_slots.py / reference vp_vqa/datasets): it pairs slots
*extracted by a trained video model* (`scripts/extract_slots.py` pkl) with
the procedurally re-rendered source videos, so the full two-stage vp
pipeline (extract -> train LDMSlotFormer -> test_vp) drives end-to-end
without data on disk.
"""

import numpy as np

from .loader import Dataset
from .synthetic import SyntheticVideoDataset


class SyntheticSlotsDataset(Dataset):
    """{'slots': [T, N, C], 'data_idx', optional 'label'/'task_idx'}."""

    def __init__(self, num_samples=256, num_slots=6, slot_size=64,
                 video_len=16, with_labels=False, seed=0):
        self.num_samples = num_samples
        self.num_slots = num_slots
        self.slot_size = slot_size
        self.video_len = video_len
        self.with_labels = with_labels
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed * 99991 + idx)
        T, N, C = self.video_len, self.num_slots, self.slot_size
        t = np.arange(T)[:, None, None]  # [T, 1, 1]
        freq = rng.rand(1, N, C) * 0.3
        phase = rng.rand(1, N, C) * 2 * np.pi
        amp = rng.rand(1, N, C)
        slots = amp * np.sin(freq * t + phase)
        out = {
            "data_idx": np.int32(idx),
            "slots": slots.astype(np.float32),
        }
        if self.with_labels:
            # deterministic function of the trajectory -> learnable label
            out["label"] = np.int32(float(slots.mean()) > 0.0)
            out["task_idx"] = np.int32(idx % 8)
        return out


class SyntheticVideoSlotsDataset(Dataset):
    """Extracted-slots + re-rendered-video pairs (synthetic Physion-slots
    analog, physion_slots.py:39-73).

    `video_slots` is one split of the `scripts/extract_slots.py` pkl
    ({name: [T, N, C]}); videos are re-rendered deterministically from the
    same (seed, idx) the extraction saw, so `img[t]` matches `slots[t]`.
    """

    def __init__(self, video_slots, resolution=(64, 64), video_len=8,
                 max_objects=4, load_img=False, seed=0):
        self.video_slots = video_slots
        self.names = sorted(video_slots.keys(), key=lambda s: int(s))
        self.load_img = load_img
        self._video = SyntheticVideoDataset(
            resolution=tuple(resolution), num_samples=len(self.names),
            n_sample_frames=video_len, max_objects=max_objects,
            load_mask=False, seed=seed)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        name = self.names[idx]
        slots = np.asarray(self.video_slots[name], np.float32)
        out = {"slots": slots, "data_idx": np.int32(idx)}
        if self.load_img:
            out["img"] = self._video[int(name)]["img"]
        return out
