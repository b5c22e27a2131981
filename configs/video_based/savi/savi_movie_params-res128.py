"""SAVi on MOVi-e, 128x128 (15 slots).

Mirrors reference video_based/configs/savi/savi_movie_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SAViBase, cnn_enc_dict, resnet18_enc_dict, slot_dict_for


class SlotAttentionParams(SAViBase):
    movi_level = "e"
    dataset = "movi"
    data_root = "./data/MOVi"
    slot_dict = slot_dict_for(15, 192, 2)
    enc_dict = resnet18_enc_dict(192)
