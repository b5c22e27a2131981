"""SA on synthetic shapes at 64x64 — the smoke-test analog of the
reference's simplest config (img_based/configs/sa/sa_clevrtex_params.py)."""

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
    lr = 4e-4
    weight_decay = 0.0
    clip_grad = 0.05
    warmup_steps_pct = 0.05

    # data
    dataset = "synthetic"
    data_root = ""
    train_samples = 256
    val_samples = 32
    max_objects = 4
    load_mask = True
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

    # model
    model = "SA"
    resolution = (64, 64)
    slot_size = 128
    slot_dict = dict(
        num_slots=6,
        slot_size=slot_size,
        slot_mlp_size=256,
        num_iterations=3,
    )
    enc_dict = dict(
        enc_channels=(3, 64, 64, 64, 64),
        enc_ks=5,
        enc_out_channels=slot_size,
        enc_norm="",
    )
    dec_dict = dict(
        dec_channels=(slot_size, 64, 64, 64, 64),
        dec_resolution=(8, 8),
        dec_ks=5,
        dec_norm="",
    )
    loss_dict = dict(use_img_recon_loss=True)

    img_recon_loss_w = 1.0
