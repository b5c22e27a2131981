"""Video dVAE stage-1 on MOVi-Tex, 128x128.

Mirrors reference video_based/configs/steve/dvae_movitex_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import DVAEVideoBase


class SlotAttentionParams(DVAEVideoBase):
    movi_level = "Tex"
    dataset = "steve_movi"
    data_root = "./data/MOVi"
