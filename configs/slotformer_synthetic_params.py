"""SlotFormer on synthetic slot trajectories — vp_vqa smoke config
(mirrors ldmslotformer_physion_params-res128.py at toy scale, with a
spatial-broadcast decoder disabled; no data needed)."""

from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    max_epochs = 2
    save_interval = 1.0
    eval_interval = 1
    save_epoch_end = False
    print_iter = 10

    optimizer = "Adam"
    lr = 2e-4
    weight_decay = 0.0
    clip_grad = -1
    warmup_steps_pct = 0.05

    dataset = "synthetic_slots"
    data_root = ""
    train_samples = 256
    val_samples = 32
    video_len = 10
    n_sample_frames = 10
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

    model = "SlotFormer"
    resolution = (64, 64)
    clip_len = 10
    slot_size = 64
    num_slots = 6
    slot_dict = dict(num_slots=num_slots, slot_size=slot_size)
    dec_dict = dict()
    rollout_dict = dict(
        num_slots=num_slots,
        slot_size=slot_size,
        history_len=6,
        t_pe="sin",
        slots_pe="",
        d_model=64,
        num_layers=2,
        num_heads=4,
        ffn_dim=256,
        norm_first=True,
    )
    loss_dict = dict(rollout_len=4, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0

    # loss decay warmup (vp_vqa/method.py:188-210)
    use_loss_decay = True
    loss_decay_pct = 0.4
