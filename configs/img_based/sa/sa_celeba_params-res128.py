"""SA on CelebA, 128x128 (4 slots, no masks).

Mirrors reference img_based/configs/sa/sa_celeba_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import SAImgBase, slot_dict_for


class SlotAttentionParams(SAImgBase):
    max_epochs = 100
    dataset = "celeba"
    data_root = "./data/CelebA"
    load_mask = False
    slot_dict = slot_dict_for(4, 192, 3)
