"""Physion-style VQA readout on synthetic labeled slots — smoke config."""

from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    max_epochs = 2
    save_interval = 1.0
    eval_interval = 1
    save_epoch_end = False
    print_iter = 10

    optimizer = "Adam"
    lr = 1e-3
    weight_decay = 0.0
    clip_grad = -1
    warmup_steps_pct = 0.0

    dataset = "synthetic_slots"
    with_labels = True
    data_root = ""
    train_samples = 256
    val_samples = 32
    video_len = 10
    n_sample_frames = 10
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

    model = "PhysionReadout"
    resolution = (64, 64)
    slot_size = 64
    num_slots = 6
    readout_dict = dict(
        num_slots=num_slots,
        slot_size=slot_size,
        agg_func="max",
        feats_dim=slot_size,
    )
    vqa_loss_w = 1.0
