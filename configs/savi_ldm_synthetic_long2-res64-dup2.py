"""Extended savi_ldm synthetic convergence run: ~5.1k optimizer steps
from scratch under the current (round-3-final) architecture — longer
FG-ARI/mIoU curves than the 2,560-step savi_ldm_synthetic_long run,
plus a soak of async orbax checkpointing over a multi-epoch run.

(The older long run's checkpoint predates the VQ-VAE mid-attention
restore, so its params cannot be resumed into the current tree — this
run supersedes it.)

Drive:
    python scripts/train.py --params configs/savi_ldm_synthetic_long2-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("savi_ldm_synthetic_long-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 80  # 64 steps/epoch at bs 8 -> 5120 steps total

SlotAttentionParams.seed = 2
