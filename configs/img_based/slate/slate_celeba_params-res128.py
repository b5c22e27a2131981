"""SLATE on CelebA, 128x128 (4 slots).

Mirrors reference img_based/configs/slate/slate_celeba_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SLATEImgBase, slot_dict_for


class SlotAttentionParams(SLATEImgBase):
    max_epochs = 100
    eval_interval = 2
    dataset = "celeba"
    data_root = "./data/CelebA"
    load_mask = False
    slot_dict = slot_dict_for(4, 192, 3)
    dvae_dict = dict(
        down_factor=4, vocab_size=4096,
        dvae_ckp_path="./pretrained/dvae_celeba_params-res128/ckpt_last")
