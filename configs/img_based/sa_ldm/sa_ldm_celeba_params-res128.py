"""SlotDiffusion (SA + LDM) on CelebA, 128x128 (4 slots).

Mirrors reference img_based/configs/sa_ldm/sa_ldm_celeba_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SALDMImgBase, ldm_dec_dict, slot_dict_for


class SlotAttentionParams(SALDMImgBase):
    max_epochs = 200
    save_interval = 0.5
    eval_interval = 2
    dataset = "celeba"
    data_root = "./data/CelebA"
    load_mask = False
    slot_dict = slot_dict_for(4, 192, 3)
    dec_dict = ldm_dec_dict(
        (128, 128), 192,
        vqvae_ckp_path="./pretrained/vqvae_celeba_params-res128/ckpt_last")
