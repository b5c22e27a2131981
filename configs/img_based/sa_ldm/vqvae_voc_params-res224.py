"""VQ-VAE stage-1 on VOC, 224x224.

Mirrors reference img_based/configs/sa_ldm/vqvae_voc_params-res224.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import VQVAEImgBase, vqvae_enc_dec_dict


class SlotAttentionParams(VQVAEImgBase):
    dataset = "voc"
    data_root = "./data/VOC"
    load_anno = False
    norm_mean = 0.5
    norm_std = 0.5
    resolution = (224, 224)
    enc_dec_dict = vqvae_enc_dec_dict((224, 224))
