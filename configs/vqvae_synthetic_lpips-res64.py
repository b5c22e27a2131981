"""VQ-VAE synthetic smoke config WITH the LPIPS perceptual term live —
exercises the full VQLPIPSLoss dict (reference vqvae/loss.py:8-46:
L1 + quant + percept) in actual training, not just the graph-parity
tests. Requires an LPIPS weights npz:

    python -c "from slotdiffusion_tpu.ops.lpips import save_random_lpips_npz; \
               save_random_lpips_npz('checkpoint/lpips_random_vgg16.npz')"
    SLOTDIFFUSION_LPIPS_WEIGHTS=checkpoint/lpips_random_vgg16.npz \
        python scripts/train.py --params configs/vqvae_synthetic_lpips-res64.py

With real torchvision/lpips .pth files, build the npz with
`convert_torch_lpips_npz` instead — nothing else changes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from importlib import import_module

_base = import_module("vqvae_synthetic_params-res64")


class SlotAttentionParams(_base.SlotAttentionParams):
    vq_dict = dict(n_embed=512, embed_dim=3, percept_loss_w=1.0)
    percept_loss_w = 1.0  # trainer-side loss weight ({name}_w contract)
