"""Image-family soak: SLATE on synthetic images, ~10.2k optimizer steps
from scratch — token-CE convergence evidence for the AR-transformer image
baseline (round-5, evening out image-family coverage vs the
sa/sa_ldm/savi_ldm/steve soaks). Stage-1 tokenizer is the 4k-step soak
dVAE (checkpoint/dvae_synthetic_long-res64). AR `recon_img` PSNR is
measured off ckpt_final by scripts/test_recon.py (KV-cached generator).
Mirrors the reference's SLATE recipe
(img_based/models/slate.py:150-191) at synthetic scale.

Drive:
    python scripts/train.py --params configs/slate_synthetic_long-res64.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("slate_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    max_epochs = 320      # 32 steps/epoch at bs 16 -> 10240 steps total
    eval_interval = 8     # token CE + viz every 8th epoch
    save_interval = 16.0
    save_epoch_end = False
    print_iter = 64
    train_samples = 512
    val_samples = 32
    train_batch_size = 16
    val_batch_size = 16

    dvae_dict = dict(
        _base.SlotAttentionParams.dvae_dict,
        dvae_ckp_path="checkpoint/dvae_synthetic_long-res64/ckpt_final")
