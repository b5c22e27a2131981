"""Synthetic slot-trajectory dataset for SlotFormer/readout tests.

Generates smooth per-slot latent trajectories (sum of low-frequency
sinusoids) so SlotFormer's rollout training/eval paths run without real
extracted slots; the labeled variant emits a deterministic binary label for
readout training.
"""

import numpy as np

from .loader import Dataset


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
