"""SLATE on CLEVRTex, 128x128.

Mirrors reference img_based/configs/slate/slate_clevrtex_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SLATEImgBase


class SlotAttentionParams(SLATEImgBase):
    dataset = "clevrtex"
    data_root = "./data/CLEVRTex"
    dvae_dict = dict(
        down_factor=4, vocab_size=4096,
        dvae_ckp_path="./pretrained/dvae_clevrtex_params-res128/ckpt_last")
