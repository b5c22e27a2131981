"""LDMSlotFormer dynamics on Physion slots, 128x128.

Mirrors reference vp_vqa/configs/ldmslotformer_physion_params-res128.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import _Common, ldm_dec_dict, slot_dict_for


class SlotAttentionParams(_Common):
    max_epochs = 25  # ~450k steps
    save_interval = 0.125
    eval_interval = 2
    save_epoch_end = True
    lr = 1e-4
    warmup_steps_pct = 0.05
    clip_grad = -1

    dataset = "physion_slots_training"
    data_root = "./data/Physion"
    slots_root = "./data/Physion/slots/physion_training_slots.pkl"
    tasks = ["all"]
    n_sample_frames = 15 + 10
    frame_offset = 3
    video_len = 150
    train_batch_size = 128
    val_batch_size = 256

    model = "LDMSlotFormer"
    input_frames = 15  # burn-in frames
    slot_size = 192
    num_slots = 8
    slot_dict = slot_dict_for(8, 192, 2)
    rollout_dict = dict(
        num_slots=8,
        slot_size=192,
        history_len=15,
        t_pe="sin",
        slots_pe="",
        d_model=256,
        num_layers=12,
        num_heads=8,
        ffn_dim=256 * 4,
        norm_first=True,
    )
    dec_dict = ldm_dec_dict(
        (128, 128), 192,
        vqvae_ckp_path="./pretrained/vqvae_physion_params-res128/ckpt_last")
    dec_dict["dm_ckp_path"] = \
        "./pretrained/savi_ldm_physion_params-res128/ckpt_last"
    loss_dict = dict(rollout_len=10, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0
