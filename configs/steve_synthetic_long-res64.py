"""STEVE long soak on synthetic video — round-4 second-family convergence
evidence (VERDICT r3 next-item 4): >=10k optimizer steps of the token
pipeline (frozen long-run dVAE -> SAVi recurrence -> AR transformer token
CE) with per-period seg metrics, mirroring what the 20.5k savi_ldm soak
proved for the diffusion family. Requires
checkpoint/dvae_synthetic_long-res64/ckpt_last (stage 1).

Drive:
    python scripts/train.py --params configs/steve_synthetic_long-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("steve_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 160
    train_samples = 512   # 64 steps/epoch at bs 8 -> 10240 steps total
    val_samples = 32
    eval_interval = 8     # seg metrics + viz every 8th epoch
    save_interval = 16.0
    print_iter = 64

    dvae_dict = dict(
        down_factor=4, vocab_size=512,
        dvae_ckp_path="checkpoint/dvae_synthetic_long-res64/ckpt_last")
