"""SlotDiffusion with frozen DINO ViT encoder on VOC, 224x224.

Mirrors reference img_based/configs/sa_ldm/sa_ldm_dino_voc_params-res224.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SALDMImgBase, dino_enc_dict, ldm_dec_dict, slot_dict_for


class SlotAttentionParams(SALDMImgBase):
    max_epochs = 500
    save_interval = 0.5
    eval_interval = 10
    save_epoch_end = False
    clip_grad = 0.05
    dataset = "voc"
    data_root = "./data/VOC"
    load_anno = True
    norm_mean = 0.5
    norm_std = 0.5
    val_batch_size = 64
    grad_accum_steps = 1
    resolution = (224, 224)
    slot_size = 192
    slot_dict = slot_dict_for(6, 192, 3)
    enc_dict = dino_enc_dict(192, (224, 224))
    dec_dict = ldm_dec_dict(
        (224, 224), 192,
        vqvae_ckp_path="./pretrained/vqvae_voc_params-res224/ckpt_last")
