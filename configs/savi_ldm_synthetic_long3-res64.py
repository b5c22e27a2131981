"""Extended savi_ldm synthetic soak: ~20.5k optimizer steps from scratch
— 4x the long2 run. Purpose (round-3 continuation): (a) long
FG-ARI/mIoU convergence curves, (b) a multi-thousand-step soak of the
async orbax checkpoint path (NOTES round-4 item), (c) periodic seg
metrics every 8 epochs to keep the log compact.

Drive:
    python scripts/train.py --params configs/savi_ldm_synthetic_long3-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("savi_ldm_synthetic_long-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 320      # 64 steps/epoch at bs 8 -> 20480 steps total
    eval_interval = 8     # seg metrics + viz every 8th epoch
    save_interval = 16.0
    print_iter = 64
