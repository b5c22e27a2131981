"""LDMSlotFormer on synthetic extracted slots, 64x64 — vp_vqa smoke config
(mirrors vp_vqa/configs/ldmslotformer_physion_params-res128.py at toy
scale). Requires:
- checkpoint/savi_ldm_synthetic_params-res64/ckpt_last (frozen LDM decoder)
- checkpoint/savi_ldm_synthetic_params-res64/slots_synthetic.pkl
  (produced by `scripts/extract_slots.py --seq_len 8` with that ckpt)
"""

from slotdiffusion_tpu.utils import BaseParams


class SlotAttentionParams(BaseParams):
    project = "SlotDiffusionTPU"

    max_epochs = 3
    save_interval = 1.0
    eval_interval = 1
    save_epoch_end = False
    print_iter = 10

    optimizer = "Adam"
    lr = 2e-4
    weight_decay = 0.0
    clip_grad = -1
    warmup_steps_pct = 0.05

    dataset = "synthetic_video_slots"
    data_root = ""
    slots_root = ("checkpoint/savi_ldm_synthetic_params-res64/"
                  "slots_synthetic.pkl")
    max_objects = 4
    video_len = 8
    n_sample_frames = 8
    train_batch_size = 16
    val_batch_size = 16
    num_workers = 2

    model = "LDMSlotFormer"
    resolution = (64, 64)
    input_frames = 4  # burn-in frames
    slot_size = 64
    num_slots = 6
    slot_dict = dict(num_slots=num_slots, slot_size=slot_size)
    rollout_dict = dict(
        num_slots=num_slots,
        slot_size=slot_size,
        history_len=4,
        t_pe="sin",
        slots_pe="",
        d_model=64,
        num_layers=2,
        num_heads=4,
        ffn_dim=256,
        norm_first=True,
    )
    # frozen LDM decoder: same architecture as savi_ldm_synthetic's
    # dm_decoder, grafted from its checkpoint via dm_ckp_path
    dec_dict = dict(
        resolution=(32, 32),
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
            vqvae_ckp_path=""),  # included in the dm_decoder graft below
        diffusion_dict=dict(
            pred_target="eps", z_scale_factor=1.0, timesteps=200,
            beta_schedule="linear", linear_start=0.0015,
            linear_end=0.0195, log_every_t=50),
        conditioning_key="crossattn",
        cond_stage_key="slots",
        dm_ckp_path="checkpoint/savi_ldm_synthetic_params-res64/ckpt_last")
    loss_dict = dict(rollout_len=4, use_img_recon_loss=False)
    slot_recon_loss_w = 1.0

    use_loss_decay = True
    loss_decay_pct = 0.4
    use_dpm = True
