"""Image-family soak: vanilla SlotAttention on synthetic images,
~10.2k optimizer steps from scratch — the FG-ARI/mIoU convergence
evidence for the plain-SA family (round-5, evening out image-family
coverage vs the sa_ldm/savi_ldm/steve soaks). Mirrors the reference's
SA recipe (img_based/models/slot_attention.py:343-417) at synthetic
scale.

Drive:
    python scripts/train.py --params configs/sa_synthetic_long-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("sa_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 320      # 32 steps/epoch at bs 16 -> 10240 steps total
    eval_interval = 8     # seg metrics + viz every 8th epoch
    save_interval = 16.0
    save_epoch_end = True
    print_iter = 64
    train_samples = 512
    val_samples = 32
