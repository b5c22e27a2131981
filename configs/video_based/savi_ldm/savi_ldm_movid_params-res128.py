"""SlotDiffusion (SAVi + LDM) on MOVi-d, 128x128.

Mirrors reference video_based/configs/savi_ldm/savi_ldm_movid_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SAViLDMBase, cnn_enc_dict, ldm_dec_dict, resnet18_enc_dict, slot_dict_for


class SlotAttentionParams(SAViLDMBase):
    movi_level = "d"
    dataset = "movi"
    data_root = "./data/MOVi"
    slot_dict = slot_dict_for(15, 192, 2)
    enc_dict = resnet18_enc_dict(192)
    dec_dict = ldm_dec_dict(
        (128, 128), 192,
        vqvae_ckp_path="./pretrained/vqvae_movid_params-res128/ckpt_last")
