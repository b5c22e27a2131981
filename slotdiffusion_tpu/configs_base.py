"""Shared bases for the config library under `configs/`.

The reference ships ~38 config files that repeat the same nested dicts with
small per-dataset deltas (e.g. img_based/configs/sa_ldm/
sa_ldm_clevrtex_params-res128.py vs ..._celeba...). Here each model family
gets one base class; the per-dataset leaf configs in `configs/` override
only what differs (dataset paths, num_slots, epochs). The attribute /
nested-dict contract is identical to the reference's so `build_model` /
`build_dataset` consume them verbatim.

All training-scale numbers (epochs, batch sizes, lr, schedules) follow the
reference configs cited per class.
"""

from slotdiffusion_tpu.utils import BaseParams


def vqvae_enc_dec_dict(resolution, img_ch=3, latent_ch=3):
    """Taming-style VQ-VAE enc/dec config (vqvae_*_params-res128.py)."""
    return dict(
        resolution=resolution[0],
        in_channels=img_ch,
        z_channels=latent_ch,
        ch=64,
        ch_mult=[1, 2, 4],  # num_down = len(ch_mult) - 1
        num_res_blocks=2,
        attn_resolutions=[],
        out_ch=img_ch,
        dropout=0.0,
    )


def vae_dict_for(resolution, ckp_path="", img_ch=3, latent_ch=3,
                 percept_loss_w=1.0):
    return dict(
        vae_type="VQVAE",
        enc_dec_dict=vqvae_enc_dec_dict(resolution, img_ch, latent_ch),
        vq_dict=dict(n_embed=4096, embed_dim=latent_ch,
                     percept_loss_w=percept_loss_w),
        vqvae_ckp_path=ckp_path,
    )


def ldm_unet_dict(slot_size, latent_ch=3):
    """Slot-conditioned denoising UNet (savi_ldm_movie_params-res128.py:
    85-101)."""
    return dict(
        in_channels=latent_ch,
        model_channels=128,
        out_channels=latent_ch,
        num_res_blocks=2,
        attention_resolutions=(8, 4, 2),
        dropout=0.1,
        channel_mult=(1, 2, 3, 4),
        num_head_channels=32,
        context_dim=slot_size,
        # reference-mirroring configs pin the numerically-stable softmax
        # (torch F.softmax semantics); the synthetic/bench configs keep the
        # measured-faster "fast" variant (bit-exact for normalized inputs,
        # unet.py:_fast_softmax; delta documented in docs/parity.md)
        attn_softmax="stable",
    )


def ldm_dec_dict(resolution, slot_size, vqvae_ckp_path="", img_ch=3,
                 latent_ch=3, use_ema=False, timesteps=1000):
    """LDM decoder dict (savi_ldm_movie_params-res128.py:102-121)."""
    return dict(
        resolution=tuple(r // 4 for r in resolution),
        vae_dict=vae_dict_for(resolution, vqvae_ckp_path, img_ch, latent_ch),
        unet_dict=ldm_unet_dict(slot_size, latent_ch),
        use_ema=use_ema,
        diffusion_dict=dict(
            pred_target="eps",
            z_scale_factor=1.0,
            timesteps=timesteps,
            beta_schedule="linear",
            linear_start=0.0015,
            linear_end=0.0195,
            cosine_s=8e-3,
            log_every_t=200,
            logvar_init=0.0,
        ),
        conditioning_key="crossattn",
        cond_stage_key="slots",
    )


def resnet18_enc_dict(slot_size):
    """GN-ResNet18 encoder, stride-4 (savi_movie_params-res128.py:51-57)."""
    return dict(
        resnet="resnet18",
        use_layer4=False,
        enc_out_channels=slot_size,
        replace_stride_with_dilation=[False, False, False],
    )


def cnn_enc_dict(slot_size):
    """Plain CNN encoder (savi_movisolid_params-res128.py:52-56)."""
    return dict(
        enc_channels=(3, 64, 64, 64, 64),
        enc_ks=5,
        enc_out_channels=slot_size,
        enc_norm="",
    )


def dino_enc_dict(slot_size, resolution, patch_size=8, small_size=True):
    """Frozen DINO ViT encoder (sa_ldm_dino_voc_params-res224.py:50-59)."""
    return dict(
        dino="dino-vits8" if small_size else "dino-vitb8",
        enc_out_channels=slot_size,
        patch_size=patch_size,
        small_size=small_size,
        resolution=tuple(resolution),
    )


def transformer_pred_dict(slot_size):
    """SAVi transformer predictor (savi_movie_params-res128.py:69-77)."""
    return dict(
        pred_type="transformer",
        pred_rnn=False,
        pred_norm_first=True,
        pred_num_layers=2,
        pred_num_heads=4,
        pred_ffn_dim=slot_size * 4,
        pred_sg_every=None,
    )


def slot_dict_for(num_slots, slot_size, num_iterations):
    return dict(
        num_slots=num_slots,
        slot_size=slot_size,
        slot_mlp_size=slot_size * 2,
        num_iterations=num_iterations,
    )


class _Common(BaseParams):
    project = "SlotDiffusionTPU"
    optimizer = "Adam"
    weight_decay = 0.0
    num_workers = 8
    n_samples = 8  # visualizations per eval
    resolution = (128, 128)
    img_ch = 3


# --------------------------------------------------------------------------
# image families (reference img_based/configs/*)
# --------------------------------------------------------------------------

class SAImgBase(_Common):
    """Slot Attention image autoencoder (sa_clevrtex_params-res128.py)."""
    max_epochs = 200
    save_interval = 2
    eval_interval = 5
    save_epoch_end = False
    lr = 4e-4
    clip_grad = -1
    warmup_steps_pct = 0.025
    load_mask = True
    train_batch_size = 64
    val_batch_size = 128
    model = "SA"
    slot_size = 192
    slot_dict = slot_dict_for(11, 192, 3)
    enc_dict = resnet18_enc_dict(192)
    dec_dict = dict(
        dec_channels=(192, 128, 128, 128, 128),
        dec_resolution=(8, 8),
        dec_ks=5,
        dec_norm="",
    )
    loss_dict = dict(use_img_recon_loss=True)
    img_recon_loss_w = 1.0


class SALDMImgBase(_Common):
    """SlotDiffusion image model (sa_ldm_clevrtex_params-res128.py)."""
    max_epochs = 400
    save_interval = 2
    eval_interval = 4
    save_epoch_end = True
    lr = 1e-4
    dec_lr = 2e-4
    clip_grad = 1.0
    warmup_steps_pct = 0.05
    load_mask = True
    train_batch_size = 64
    val_batch_size = 128
    model = "SADiffusion"
    slot_size = 192
    latent_ch = 3
    slot_dict = slot_dict_for(11, 192, 3)
    enc_dict = resnet18_enc_dict(192)
    dec_dict = ldm_dec_dict((128, 128), 192)
    loss_dict = dict(use_denoise_loss=True)
    denoise_loss_w = 1.0


class SLATEImgBase(_Common):
    """SLATE baseline (slate_clevrtex_params-res128.py)."""
    max_epochs = 200
    save_interval = 0.5
    eval_interval = 4
    save_epoch_end = True
    lr = 1e-4
    dec_lr = 3e-4
    clip_grad = 1.0
    warmup_steps_pct = 0.05
    load_mask = True
    train_batch_size = 64
    val_batch_size = 128
    model = "SLATE"
    slot_size = 192
    slot_dict = slot_dict_for(11, 192, 3)
    dvae_dict = dict(down_factor=4, vocab_size=4096, dvae_ckp_path="")
    enc_dict = resnet18_enc_dict(192)
    dec_dict = dict(dec_num_layers=8, dec_num_heads=4, dec_d_model=192)
    loss_dict = dict(use_img_recon_loss=False)
    token_recon_loss_w = 1.0
    img_recon_loss_w = 1.0


class DVAEImgBase(_Common):
    """dVAE tokenizer stage-1 (dvae_clevrtex_params-res128.py)."""
    max_epochs = 100
    save_interval = 0.5
    eval_interval = 4
    save_epoch_end = True
    lr = 1e-3
    clip_grad = -1.0
    warmup_steps_pct = 0.05
    load_mask = False
    train_batch_size = 64
    val_batch_size = 128
    model = "dVAE"
    vocab_size = 4096
    dvae_dict = dict(down_factor=4, vocab_size=4096)
    init_tau = 1.0
    final_tau = 0.1
    tau_decay_pct = 0.15
    recon_loss_w = 1.0


class VQVAEImgBase(_Common):
    """VQ-VAE stage-1 (vqvae_clevrtex_params-res128.py)."""
    max_epochs = 100
    save_interval = 0.5
    eval_interval = 4
    save_epoch_end = True
    lr = 1e-3
    clip_grad = -1.0
    warmup_steps_pct = 0.05
    load_mask = False
    train_batch_size = 64
    val_batch_size = 128
    model = "VQVAE"
    enc_dec_dict = vqvae_enc_dec_dict((128, 128))
    vq_dict = dict(n_embed=4096, embed_dim=3, percept_loss_w=1.0)
    recon_loss_w = 1.0
    quant_loss_w = 1.0
    percept_loss_w = 1.0


# --------------------------------------------------------------------------
# video families (reference video_based/configs/*)
# --------------------------------------------------------------------------

class _VideoCommon(_Common):
    n_sample_frames = 3  # follow STEVE; SAVi uses 6
    frame_offset = 1
    video_len = 24
    load_mask = True
    input_frames = 3


class SAViBase(_VideoCommon):
    """SAVi video baseline (savi_movie_params-res128.py)."""
    max_epochs = 30
    save_interval = 0.25
    eval_interval = 1
    save_epoch_end = True
    lr = 1e-4
    clip_grad = 0.05
    warmup_steps_pct = 0.025
    train_batch_size = 32
    val_batch_size = 64
    model = "SAVi"
    slot_size = 192
    slot_dict = slot_dict_for(15, 192, 2)
    enc_dict = resnet18_enc_dict(192)
    dec_dict = dict(
        dec_channels=(192, 64, 64, 64, 64),
        dec_resolution=(8, 8),
        dec_ks=5,
        dec_norm="",
    )
    pred_dict = transformer_pred_dict(192)
    loss_dict = dict(use_img_recon_loss=True)
    img_recon_loss_w = 1.0


class SAViLDMBase(_VideoCommon):
    """SlotDiffusion video model (savi_ldm_movie_params-res128.py)."""
    max_epochs = 30
    save_interval = 0.1
    eval_interval = 1
    save_epoch_end = True
    lr = 1e-4
    dec_lr = 2e-4
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    grad_accum_steps = 1
    train_batch_size = 32
    val_batch_size = 32
    model = "SAViDiffusion"
    slot_size = 192
    latent_ch = 3
    slot_dict = slot_dict_for(15, 192, 2)
    enc_dict = resnet18_enc_dict(192)
    dec_dict = ldm_dec_dict((128, 128), 192)
    pred_dict = transformer_pred_dict(192)
    loss_dict = dict(use_denoise_loss=True)
    denoise_loss_w = 1.0
    use_dpm = False


class STEVEBase(_VideoCommon):
    """STEVE video baseline (steve_movie_params-res128.py)."""
    max_epochs = 30
    save_interval = 0.1
    eval_interval = 1
    save_epoch_end = True
    lr = 1e-4
    dec_lr = 3e-4
    clip_grad = 0.05
    warmup_steps_pct = 0.05
    train_batch_size = 32
    val_batch_size = 64
    model = "STEVE"
    slot_size = 192
    slot_dict = slot_dict_for(15, 192, 2)
    dvae_dict = dict(down_factor=4, vocab_size=4096, dvae_ckp_path="")
    enc_dict = resnet18_enc_dict(192)
    dec_dict = dict(dec_num_layers=8, dec_num_heads=4, dec_d_model=192)
    pred_dict = transformer_pred_dict(192)
    loss_dict = dict(use_img_recon_loss=False)
    token_recon_loss_w = 1.0
    img_recon_loss_w = 1.0


class DVAEVideoBase(DVAEImgBase):
    """Video dVAE stage-1 (dvae_movie_params-res128.py): trains on single
    frames (n_sample_frames=1)."""
    max_epochs = 50
    eval_interval = 2
    n_sample_frames = 1
    frame_offset = 1
    video_len = 24
    train_batch_size = 64
    val_batch_size = 128


class VQVAEVideoBase(VQVAEImgBase):
    """Video VQ-VAE stage-1 (vqvae_movie_params-res128.py): trains on
    single frames."""
    max_epochs = 50
    eval_interval = 2
    n_sample_frames = 1
    frame_offset = 1
    video_len = 24
    train_batch_size = 64
    val_batch_size = 128
