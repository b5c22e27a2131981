"""Video VQ-VAE stage-1 on MOVi-d, 128x128.

Mirrors reference video_based/configs/savi_ldm/vqvae_movid_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import VQVAEVideoBase


class SlotAttentionParams(VQVAEVideoBase):
    movi_level = "d"
    dataset = "movi"
    data_root = "./data/MOVi"
