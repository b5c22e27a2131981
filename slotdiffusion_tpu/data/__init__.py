from .loader import DataLoader, Dataset, DataModule
from .synthetic import SyntheticImageDataset, SyntheticVideoDataset

__all__ = [
    "DataLoader",
    "Dataset",
    "DataModule",
    "SyntheticImageDataset",
    "SyntheticVideoDataset",
]


def build_dataset(params, val_only=False):
    """Dataset dispatch by `params.dataset`, the analog of the reference's
    per-task `build_dataset` (img_based/datasets/__init__.py:7-9,
    video_based/datasets/__init__.py:6-10)."""
    from . import builders
    return builders.build_dataset(params, val_only=val_only)
