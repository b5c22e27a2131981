"""SlotDiffusion with frozen DINO ViT encoder on COCO, 224x224.

Mirrors reference img_based/configs/sa_ldm/sa_ldm_dino_coco_params-res224.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SALDMImgBase, dino_enc_dict, ldm_dec_dict, slot_dict_for


class SlotAttentionParams(SALDMImgBase):
    max_epochs = 100
    save_interval = 0.25
    eval_interval = 4
    save_epoch_end = False
    clip_grad = 0.05
    dataset = "coco"
    data_root = "./data/COCO"
    load_anno = True
    norm_mean = 0.5
    norm_std = 0.5
    val_batch_size = 64
    grad_accum_steps = 1
    resolution = (224, 224)
    slot_size = 256
    slot_dict = slot_dict_for(7, 256, 3)
    enc_dict = dino_enc_dict(256, (224, 224))
    dec_dict = ldm_dec_dict(
        (224, 224), 256,
        vqvae_ckp_path="./pretrained/vqvae_coco_params-res224/ckpt_last")
