"""STEVE on MOVi-Tex, 128x128.

Mirrors reference video_based/configs/steve/steve_movitex_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import STEVEBase, cnn_enc_dict, resnet18_enc_dict, slot_dict_for


class SlotAttentionParams(STEVEBase):
    movi_level = "Tex"
    dataset = "steve_movi"
    data_root = "./data/MOVi"
    slot_dict = slot_dict_for(12, 192, 2)
    enc_dict = cnn_enc_dict(192)
    dvae_dict = dict(
        down_factor=4, vocab_size=4096,
        dvae_ckp_path="./pretrained/dvae_movitex_params-res128/ckpt_last")
