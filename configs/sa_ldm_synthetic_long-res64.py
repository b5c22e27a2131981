"""Image-family soak: SADiffusion (SA + LDM) on synthetic images,
~12.3k optimizer steps from scratch. Round-4 convergence evidence for the
third family (after the savi_ldm 20.5k and dVAE->STEVE 10.2k soaks):
denoise loss down, FG-ARI/mIoU up, async orbax saves throughout.

Requires the stage-1 checkpoint/vqvae_synthetic_params-res64/ckpt_last.

Drive:
    python scripts/train.py --params configs/sa_ldm_synthetic_long-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("sa_ldm_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 192      # 64 steps/epoch at bs 8 -> 12288 steps total
    eval_interval = 8     # seg metrics + viz every 8th epoch
    save_interval = 16.0
    save_epoch_end = True
    print_iter = 64
    train_samples = 512
    val_samples = 32
