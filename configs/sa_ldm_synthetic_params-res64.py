"""SlotDiffusion on synthetic images (SA + LDM), 64x64 — smoke config for
the image family (mirrors sa_ldm_clevrtex_params-res128.py at toy scale);
requires the stage-1 checkpoint/vqvae_synthetic_params-res64/ckpt_last
(the VQ-VAE is frame-level, so the video-frame-trained stage-1 is
reusable here)."""

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
    dec_lr = 2e-4  # dual-LR DM decoder group (img_based/method.py:235-285)
    weight_decay = 0.0
    clip_grad = 0.05
    warmup_steps_pct = 0.05

    dataset = "synthetic"
    data_root = ""
    train_samples = 128
    val_samples = 16
    max_objects = 4
    load_mask = True
    train_batch_size = 8
    val_batch_size = 8
    num_workers = 2

    model = "SADiffusion"
    resolution = (64, 64)
    slot_size = 64
    slot_dict = slot_dict_for(6, 64, 2)
    enc_dict = dict(
        enc_channels=(3, 32, 32, 32),
        enc_ks=5,
        enc_out_channels=slot_size,
        enc_norm="",
    )
    dec_dict = dict(
        resolution=(32, 32),  # 2x-down VQ latents
        unet_dict=dict(
            in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(4, 2), dropout=0.0,
            channel_mult=(1, 2), num_head_channels=8,
            context_dim=slot_size),
        vae_dict=dict(
            vae_type="VQVAE",
            enc_dec_dict=dict(
                resolution=64, in_channels=3, z_channels=3, ch=32,
                ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                out_ch=3, dropout=0.0),
            vq_dict=dict(n_embed=512, embed_dim=3, percept_loss_w=0.0),
            vqvae_ckp_path="checkpoint/vqvae_synthetic_params-res64/"
                           "ckpt_last"),
        use_ema=True,
        diffusion_dict=dict(
            pred_target="eps", z_scale_factor=1.0, timesteps=200,
            beta_schedule="linear", linear_start=0.0015,
            linear_end=0.0195, log_every_t=50),
        conditioning_key="crossattn",
        cond_stage_key="slots")
    loss_dict = dict(use_denoise_loss=True)
    denoise_loss_w = 1.0
    use_dpm = True
