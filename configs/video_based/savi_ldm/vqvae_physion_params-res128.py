"""Video VQ-VAE stage-1 on Physion, 128x128.

Mirrors reference video_based/configs/savi_ldm/vqvae_physion_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import VQVAEVideoBase


class SlotAttentionParams(VQVAEVideoBase):
    max_epochs = 20
    save_interval = 0.25
    eval_interval = 1
    lr = 5e-4
    dataset = "physion_training"
    data_root = "./data/Physion"
    tasks = ["all"]
    video_len = 150
