"""SA on CLEVRTex, 128x128.

Mirrors reference img_based/configs/sa/sa_clevrtex_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SAImgBase


class SlotAttentionParams(SAImgBase):
    dataset = "clevrtex"
    data_root = "./data/CLEVRTex"
