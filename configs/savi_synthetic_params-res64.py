"""SAVi on synthetic moving shapes at 64x64 — the video smoke-test config
(mirrors savi_movie_params-res128.py at toy scale; no data needed)."""

from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    # training
    max_epochs = 2
    save_interval = 1.0
    eval_interval = 1
    save_epoch_end = False
    print_iter = 10

    # optimizer
    optimizer = "Adam"
    lr = 1e-4
    weight_decay = 0.0
    clip_grad = 0.05
    warmup_steps_pct = 0.05

    # data
    dataset = "synthetic_video"
    data_root = ""
    train_samples = 128
    val_samples = 16
    max_objects = 4
    n_sample_frames = 3
    frame_offset = 1
    video_len = 6
    load_mask = True
    train_batch_size = 8
    val_batch_size = 8
    num_workers = 2

    # model
    model = "SAVi"
    resolution = (64, 64)
    slot_size = 64
    slot_dict = dict(
        num_slots=6,
        slot_size=slot_size,
        slot_mlp_size=slot_size * 2,
        num_iterations=2,
    )
    enc_dict = dict(
        enc_channels=(3, 32, 32, 32),
        enc_ks=5,
        enc_out_channels=slot_size,
        enc_norm="",
    )
    dec_dict = dict(
        dec_channels=(slot_size, 32, 32, 32),
        dec_resolution=(8, 8),
        dec_ks=5,
        dec_norm="",
    )
    pred_dict = dict(
        pred_type="transformer",
        pred_rnn=False,
        pred_norm_first=True,
        pred_num_layers=1,
        pred_num_heads=2,
        pred_ffn_dim=slot_size * 2,
        pred_sg_every=None,
    )
    loss_dict = dict(use_img_recon_loss=True)
    img_recon_loss_w = 1.0
