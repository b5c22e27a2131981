"""SlotDiffusion (SAVi + LDM) on Physion, 128x128 (8 slots).

Mirrors reference video_based/configs/savi_ldm/savi_ldm_physion_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SAViLDMBase, ldm_dec_dict, slot_dict_for


class SlotAttentionParams(SAViLDMBase):
    max_epochs = 10
    save_interval = 0.05
    dataset = "physion_training"
    data_root = "./data/Physion"
    tasks = ["all"]
    video_len = 150
    train_batch_size = 48
    val_batch_size = 96
    slot_dict = slot_dict_for(8, 192, 2)
    dec_dict = ldm_dec_dict(
        (128, 128), 192,
        vqvae_ckp_path="./pretrained/vqvae_physion_params-res128/ckpt_last")
