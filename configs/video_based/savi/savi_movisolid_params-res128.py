"""SAVi on MOVi-Solid, 128x128 (12 slots).

Mirrors reference video_based/configs/savi/savi_movisolid_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SAViBase, cnn_enc_dict, resnet18_enc_dict, slot_dict_for


class SlotAttentionParams(SAViBase):
    movi_level = "Solid"
    dataset = "steve_movi"
    data_root = "./data/MOVi"
    slot_dict = slot_dict_for(12, 192, 2)
    enc_dict = cnn_enc_dict(192)
