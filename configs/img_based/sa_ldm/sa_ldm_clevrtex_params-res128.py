"""SlotDiffusion (SA + LDM) on CLEVRTex, 128x128.

Mirrors reference img_based/configs/sa_ldm/sa_ldm_clevrtex_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SALDMImgBase, ldm_dec_dict


class SlotAttentionParams(SALDMImgBase):
    dataset = "clevrtex"
    data_root = "./data/CLEVRTex"
    max_obj = -1
    dec_dict = ldm_dec_dict(
        (128, 128), 192,
        vqvae_ckp_path="./pretrained/vqvae_clevrtex_params-res128/ckpt_last")
