"""Physion VQA linear readout on rollout slots.

Mirrors reference vp_vqa/configs/readout_physion_params.py — same model/data/optimizer scales; see
slotdiffusion_tpu/configs_base.py for the shared family settings.
"""

from slotdiffusion_tpu.configs_base import _Common


class SlotAttentionParams(_Common):
    max_epochs = 50
    save_interval = 1.0
    eval_interval = 2
    save_epoch_end = True
    lr = 1e-3
    warmup_steps_pct = 0.0  # no warmup
    clip_grad = -1

    dataset = "physion_slots_label_readout"
    data_root = "./data/Physion"
    slots_root = "./data/Physion/slots/rollout-physion_readout_slots.pkl"
    tasks = ["all"]
    n_sample_frames = 6
    frame_offset = 1
    video_len = 75
    train_batch_size = 64
    val_batch_size = 128

    model = "PhysionReadout"
    slot_size = 192
    num_slots = 8
    readout_dict = dict(
        num_slots=8,
        slot_size=192,
        agg_func="max",
        feats_dim=192,
    )
    vqa_loss_w = 1.0
