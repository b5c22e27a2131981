"""VQ-VAE stage-1 on synthetic video frames, 64x64 — smoke config for the
two-stage SlotDiffusion pipeline (no data needed)."""

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
    warmup_steps_pct = 0.05

    dataset = "synthetic_video"
    data_root = ""
    train_samples = 128
    val_samples = 16
    max_objects = 4
    n_sample_frames = 1  # single frames (vqvae_movie_params-res128.py)
    frame_offset = 1
    video_len = 6
    load_mask = False
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

    model = "VQVAE"
    resolution = (64, 64)
    enc_dec_dict = dict(
        resolution=64,
        in_channels=3,
        z_channels=3,
        ch=32,
        ch_mult=[1, 2],
        num_res_blocks=1,
        attn_resolutions=[],
        out_ch=3,
        dropout=0.0,
    )
    vq_dict = dict(n_embed=512, embed_dim=3, percept_loss_w=0.0)
    recon_loss_w = 1.0
    quant_loss_w = 1.0
