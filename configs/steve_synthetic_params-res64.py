"""STEVE on synthetic video, 64x64 — smoke config for the token-based
video baseline; requires the stage-1
checkpoint/dvae_synthetic_params-res64/ckpt_last (mirrors
steve_movie_params-res128.py at toy scale: SAVi recurrence + frozen dVAE
tokens + AR transformer decoder with dual-LR)."""

from slotdiffusion_tpu.configs_base import slot_dict_for
from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    max_epochs = 2
    save_interval = 1.0
    eval_interval = 1
    save_epoch_end = False
    print_iter = 10

    optimizer = "Adam"
    lr = 1e-4
    dec_lr = 3e-4  # dual-LR AR decoder group (steve_movie_params:27)
    weight_decay = 0.0
    clip_grad = 0.05
    warmup_steps_pct = 0.05

    dataset = "synthetic_video"
    data_root = ""
    train_samples = 128
    val_samples = 16
    max_objects = 4
    n_sample_frames = 2
    frame_offset = 1
    video_len = 6
    load_mask = True
    train_batch_size = 8
    val_batch_size = 8
    num_workers = 2

    model = "STEVE"
    resolution = (64, 64)
    slot_size = 64
    slot_dict = slot_dict_for(6, 64, 2)
    enc_dict = dict(
        enc_channels=(3, 32, 32, 32),
        enc_ks=5,
        enc_out_channels=slot_size,
        enc_norm="",
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
    dvae_dict = dict(
        down_factor=4, vocab_size=512,
        dvae_ckp_path="checkpoint/dvae_synthetic_params-res64/ckpt_last")
    dec_dict = dict(dec_num_layers=2, dec_num_heads=4, dec_d_model=64)
    loss_dict = dict(use_img_recon_loss=False)
    token_recon_loss_w = 1.0
    img_recon_loss_w = 1.0
