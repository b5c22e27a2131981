"""File-backed flagship soak (round-5 VERDICT item 1): savi_ldm trained
with ``dataset="movi"`` reading a generated on-disk MOVi-layout tree
(JPEG frames + grayscale PNG masks, scripts/gen_movi_tree.py) through
the real loader stack — fastio/PIL decode, split-index caching,
SampleError retry, threaded prefetch — exactly how every reference run
executes (video_based/datasets/movi.py:62-122).

Content distribution matches the in-memory synthetic soaks
(savi_ldm_synthetic_long-res64), so loss/ARI curves are directly
comparable; the steps_per_sec delta vs that run quantifies the input
pipeline's cost on this 1-core host.

Drive:
    python scripts/gen_movi_tree.py --root data_local/movi_file \
        --videos 512 --val_videos 32 --frames 6 --res 64
    python scripts/train.py --params configs/savi_ldm_movi_file-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("savi_ldm_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    dataset = "movi"
    movi_level = "e"
    data_root = "data_local/movi_file"
    video_len = 6
    n_sample_frames = 2
    frame_offset = 1
    load_mask = True
    num_workers = 4

    # 512 videos x 5 start idxs = 2560 clips/epoch -> 320 steps/epoch at
    # bs 8; 32 epochs = 10,240 optimizer steps (>=10k target)
    max_epochs = 32
    eval_interval = 2     # seg metrics + viz every other epoch
    save_interval = 8.0
    print_iter = 64
