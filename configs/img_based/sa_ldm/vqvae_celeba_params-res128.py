"""VQ-VAE stage-1 on CelebA, 128x128.

Mirrors reference img_based/configs/sa_ldm/vqvae_celeba_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import VQVAEImgBase, vqvae_enc_dec_dict


class SlotAttentionParams(VQVAEImgBase):
    dataset = "celeba"
    data_root = "./data/CelebA"
