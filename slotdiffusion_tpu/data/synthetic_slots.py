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


class SyntheticRolloutSlotsDataset(Dataset):
    """Rolled-out-slots + derived-VQA-label pairs (synthetic analog of
    `PhysionSlotsLabelDataset`, physion_slots.py:75-142 / reference
    vp_vqa/datasets/physion.py:234-354).

    `rollout_slots` is one split of the `scripts/rollout_physion_slots.py`
    pkl ({name: [T, N, C]}, where names are the data_idx of the source
    synthetic videos). The label is a physical property of the SOURCE
    video — "does it contain >= ceil((max_objects+1)/2) objects" —
    re-derived from the same (seed, idx) RNG the renderer used
    (synthetic.py:92-94), so the readout must recover real scene content
    from the rollout, mirroring Physion's contact-event labels. The
    object count also serves as the per-task breakdown
    (test_physion_vqa.py reads `all_tasks`)."""

    def __init__(self, rollout_slots, seed=0, max_objects=4):
        self.rollout_slots = rollout_slots
        self.names = sorted(rollout_slots.keys(), key=lambda s: int(s))
        self.seed = seed
        self.max_objects = max_objects
        self.label_min_objects = (max_objects + 2) // 2
        self.all_tasks = [f"objects_{i + 1}" for i in range(max_objects)]

    def __len__(self):
        return len(self.names)

    def _n_objects(self, video_idx):
        # must match SyntheticVideoDataset.__getitem__ (synthetic.py:92-94)
        rng = np.random.RandomState(self.seed * 100003 + video_idx)
        return int(rng.randint(1, self.max_objects + 1))

    def __getitem__(self, idx):
        name = self.names[idx]
        n_obj = self._n_objects(int(name))
        return {
            "slots": np.asarray(self.rollout_slots[name], np.float32),
            "data_idx": np.int32(idx),
            "label": np.int32(n_obj >= self.label_min_objects),
            "task_idx": np.int32(n_obj - 1),
        }


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
        # data_idx carries the SOURCE render index (int(name)), not the
        # positional index: downstream pkl writers key entries by data_idx
        # (rollout_physion_slots.py:77-80), and the rollout-label derivation
        # re-runs the renderer RNG at that index (SyntheticRolloutSlots-
        # Dataset._n_objects) — a positional index would silently misalign
        # labels the moment an extraction pkl is subset/filtered.
        out = {"slots": slots, "data_idx": np.int32(int(name))}
        if self.load_img:
            out["img"] = self._video[int(name)]["img"]
        return out
