"""SlotDiffusion (SAVi + LDM) synthetic convergence config — the round-3
long run (VERDICT item 9): ~2.5k optimizer steps with per-epoch seg
metrics so FG-ARI/mIoU trends are visible in train_log.jsonl. Same model
as savi_ldm_synthetic_params-res64.py, more data/epochs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("savi_ldm_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 40
    train_samples = 512   # 64 steps/epoch at bs 8 -> 2560 steps total
    val_samples = 32
    eval_interval = 2     # seg metrics + viz every other epoch
    save_interval = 4.0
    print_iter = 32
