"""Shape/grad smoke tests for every model family (tiny configs).

The reference has no unit tests (SURVEY.md §4); these pin the public model
contracts: output dict keys, shapes, loss dict keys, differentiability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models import build_model
from slotdiffusion_tpu.utils import BaseParams

pytestmark = pytest.mark.fast

RES = (32, 32)
SLOT_SIZE = 32


def tiny_unet_dict(in_ch=3):
    return dict(
        in_channels=in_ch,
        model_channels=16,
        out_channels=in_ch,
        num_res_blocks=1,
        attention_resolutions=(2,),
        dropout=0.0,
        channel_mult=(1, 2),
        num_head_channels=8,
        context_dim=SLOT_SIZE,
    )


def tiny_vae_dict():
    return dict(
        vae_type="VQVAE",
        enc_dec_dict=dict(
            resolution=RES[0], in_channels=3, z_channels=3, ch=16,
            ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
            out_ch=3, dropout=0.0),
        vq_dict=dict(n_embed=64, embed_dim=3, percept_loss_w=0.0),
    )


def slot_dict():
    return dict(num_slots=4, slot_size=SLOT_SIZE,
                slot_mlp_size=SLOT_SIZE * 2, num_iterations=2)


def enc_dict():
    return dict(enc_channels=(3, 16, 16), enc_ks=5,
                enc_out_channels=SLOT_SIZE, enc_norm="")


def _p(**kw):
    p = BaseParams()
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _init_and_loss(model, batch, rngs_extra=()):
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
        ("params", "diffusion", "gumbel", "dropout", "default"))}
    variables = model.init(rngs, batch, method=model.compute_losses)
    out, losses = model.apply(
        variables, batch,
        rngs={k: v for k, v in rngs.items() if k != "params"},
        method=model.compute_losses)
    return variables, out, losses


def img_batch(B=2):
    rng = np.random.RandomState(0)
    return {
        "img": jnp.asarray(rng.rand(B, *RES, 3) * 2 - 1, jnp.float32),
        "masks": jnp.asarray(rng.randint(0, 4, (B, *RES)), jnp.int32),
    }


def video_batch(B=2, T=3):
    rng = np.random.RandomState(0)
    return {
        "img": jnp.asarray(rng.rand(B, T, *RES, 3) * 2 - 1, jnp.float32),
        "masks": jnp.asarray(rng.randint(0, 4, (B, T, *RES)), jnp.int32),
    }


def test_sa_forward_and_loss():
    params = _p(model="SA", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(dec_channels=(SLOT_SIZE, 16, 16),
                              dec_resolution=(8, 8), dec_ks=5, dec_norm=""),
                loss_dict=dict(use_img_recon_loss=True))
    model = build_model(params)
    batch = img_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["recon_img"].shape == (2, *RES, 3)
    assert out["recons"].shape == (2, 4, *RES, 3)
    assert out["masks"].shape == (2, 4, *RES, 1)
    assert out["slots"].shape == (2, 4, SLOT_SIZE)
    # masks sum to one over slots
    np.testing.assert_allclose(
        np.asarray(out["masks"]).sum(1), 1.0, atol=1e-5)
    assert "img_recon_loss" in losses
    assert np.isfinite(float(losses["img_recon_loss"]))


def test_sa_diffusion_pixel_space():
    params = _p(model="SADiffusion", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(
                    resolution=RES,
                    unet_dict=tiny_unet_dict(),
                    use_ema=True,
                    diffusion_dict=dict(
                        pred_target="eps", timesteps=50,
                        beta_schedule="linear", linear_start=1e-4,
                        linear_end=2e-2, log_every_t=25),
                    conditioning_key="crossattn", cond_stage_key="slots"),
                loss_dict=dict(use_denoise_loss=True))
    model = build_model(params)
    batch = img_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["slots"].shape == (2, 4, SLOT_SIZE)
    assert out["masks"].shape == (2, 4, *RES)
    assert "denoise_loss" in losses
    assert np.isfinite(float(losses["denoise_loss"]))


def test_sa_diffusion_ldm():
    params = _p(model="SADiffusion", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(
                    resolution=tuple(r // 2 for r in RES),
                    unet_dict=tiny_unet_dict(),
                    vae_dict=tiny_vae_dict(),
                    use_ema=False,
                    diffusion_dict=dict(
                        pred_target="eps", z_scale_factor=1.0, timesteps=50,
                        beta_schedule="linear", linear_start=0.0015,
                        linear_end=0.0195, log_every_t=25),
                    conditioning_key="crossattn", cond_stage_key="slots"),
                loss_dict=dict(use_denoise_loss=True))
    model = build_model(params)
    batch = img_batch()
    variables, out, losses = _init_and_loss(model, batch)
    assert "denoise_loss" in losses
    # VAE params exist under dm_decoder/vae
    assert "vae" in variables["params"]["dm_decoder"]


def test_savi_video():
    params = _p(model="SAVi", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(dec_channels=(SLOT_SIZE, 16, 16),
                              dec_resolution=(8, 8), dec_ks=5, dec_norm=""),
                pred_dict=dict(pred_type="transformer", pred_rnn=False,
                               pred_norm_first=True, pred_num_layers=1,
                               pred_num_heads=2,
                               pred_ffn_dim=SLOT_SIZE * 2),
                loss_dict=dict(use_img_recon_loss=True),
                n_sample_frames=3)
    model = build_model(params)
    batch = video_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["recon_img"].shape == (2, 3, *RES, 3)
    assert out["slots"].shape == (2, 3, 4, SLOT_SIZE)
    assert np.isfinite(float(losses["img_recon_loss"]))


def test_savi_rnn_predictor():
    params = _p(model="SAVi", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(dec_channels=(SLOT_SIZE, 16, 16),
                              dec_resolution=(8, 8), dec_ks=5, dec_norm=""),
                pred_dict=dict(pred_type="mlp", pred_rnn=True,
                               pred_norm_first=True, pred_sg_every=None),
                loss_dict=dict(use_img_recon_loss=True),
                n_sample_frames=3)
    model = build_model(params)
    batch = video_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["slots"].shape == (2, 3, 4, SLOT_SIZE)


def test_savi_diffusion_video_ldm():
    params = _p(model="SAViDiffusion", resolution=RES,
                slot_dict=slot_dict(), enc_dict=enc_dict(),
                dec_dict=dict(
                    resolution=tuple(r // 2 for r in RES),
                    unet_dict=tiny_unet_dict(),
                    vae_dict=tiny_vae_dict(),
                    use_ema=False,
                    diffusion_dict=dict(
                        pred_target="eps", z_scale_factor=1.0, timesteps=50,
                        beta_schedule="linear", linear_start=0.0015,
                        linear_end=0.0195, log_every_t=25),
                    conditioning_key="crossattn", cond_stage_key="slots"),
                pred_dict=dict(pred_type="transformer", pred_rnn=False,
                               pred_norm_first=True, pred_num_layers=1,
                               pred_num_heads=2,
                               pred_ffn_dim=SLOT_SIZE * 2),
                loss_dict=dict(use_denoise_loss=True),
                n_sample_frames=3)
    model = build_model(params)
    batch = video_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["slots"].shape == (2, 3, 4, SLOT_SIZE)
    assert out["masks"].shape == (2, 3, 4, *RES)
    assert np.isfinite(float(losses["denoise_loss"]))


def test_vqvae_roundtrip():
    vd = tiny_vae_dict()
    params = _p(model="VQVAE", enc_dec_dict=vd["enc_dec_dict"],
                vq_dict=vd["vq_dict"], resolution=RES)
    model = build_model(params)
    batch = img_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["recon"].shape == batch["img"].shape
    assert out["token_id"].shape == (2, RES[0] // 2, RES[1] // 2)
    assert "recon_loss" in losses and "quant_loss" in losses


def test_vqvae_temporal_wrapper():
    vd = tiny_vae_dict()
    params = _p(model="VQVAE", enc_dec_dict=vd["enc_dec_dict"],
                vq_dict=vd["vq_dict"], resolution=RES)
    model = build_model(params)
    vbatch = video_batch()
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, vbatch)
    out = model.apply(variables, vbatch)
    assert out["recon"].shape == vbatch["img"].shape  # [B, T, H, W, 3]


def test_dvae():
    params = _p(model="dVAE", vocab_size=32, resolution=RES,
                dvae_dict=dict(vocab_size=32))
    model = build_model(params)
    batch = img_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert out["recon"].shape == batch["img"].shape
    assert out["z_logits"].shape == (2, RES[0] // 4, RES[1] // 4, 32)
    assert np.isfinite(float(losses["recon_loss"]))


def test_steve():
    params = _p(model="STEVE", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(dec_d_model=32, dec_num_heads=2,
                              dec_num_layers=1),
                dvae_dict=dict(vocab_size=32, down_factor=4),
                pred_dict=dict(pred_type="transformer", pred_rnn=False,
                               pred_norm_first=True, pred_num_layers=1,
                               pred_num_heads=2,
                               pred_ffn_dim=SLOT_SIZE * 2),
                loss_dict=dict(use_img_recon_loss=False),
                n_sample_frames=3)
    model = build_model(params)
    batch = video_batch()
    _, out, losses = _init_and_loss(model, batch)
    n_patches = (RES[0] // 4) * (RES[1] // 4)
    assert out["pred_token_id"].shape == (2 * 3, n_patches, 32)
    assert np.isfinite(float(losses["token_recon_loss"]))


def test_slate():
    params = _p(model="SLATE", resolution=RES, slot_dict=slot_dict(),
                enc_dict=enc_dict(),
                dec_dict=dict(dec_d_model=32, dec_num_heads=2,
                              dec_num_layers=1),
                dvae_dict=dict(vocab_size=32, down_factor=4),
                loss_dict=dict(use_img_recon_loss=False))
    model = build_model(params)
    batch = img_batch()
    _, out, losses = _init_and_loss(model, batch)
    assert np.isfinite(float(losses["token_recon_loss"]))


def test_slotformer():
    params = _p(model="SlotFormer", resolution=RES, clip_len=6,
                slot_dict=dict(num_slots=4, slot_size=SLOT_SIZE),
                dec_dict=dict(dec_channels=(SLOT_SIZE, 16, 16),
                              dec_resolution=(8, 8), dec_ks=5, dec_norm=""),
                rollout_dict=dict(num_slots=4, slot_size=SLOT_SIZE,
                                  history_len=3, t_pe="sin", slots_pe="",
                                  d_model=32, num_layers=1, num_heads=2,
                                  ffn_dim=64, norm_first=True),
                loss_dict=dict(rollout_len=2, use_img_recon_loss=False))
    model = build_model(params)
    rng = np.random.RandomState(0)
    batch = {"slots": jnp.asarray(rng.randn(2, 5, 4, SLOT_SIZE),
                                  jnp.float32)}
    _, out, losses = _init_and_loss(model, batch)
    assert out["pred_slots"].shape == (2, 2, 4, SLOT_SIZE)
    assert np.isfinite(float(losses["slot_recon_loss"]))


def test_slotformer_short_video_masking():
    params = _p(model="SlotFormer", resolution=RES, clip_len=6,
                slot_dict=dict(num_slots=4, slot_size=SLOT_SIZE),
                dec_dict=dict(),
                rollout_dict=dict(num_slots=4, slot_size=SLOT_SIZE,
                                  history_len=3, t_pe="sin", slots_pe="",
                                  d_model=32, num_layers=1, num_heads=2,
                                  ffn_dim=64, norm_first=True),
                loss_dict=dict(rollout_len=2, use_img_recon_loss=False))
    model = build_model(params)
    rng = np.random.RandomState(0)
    batch = {
        "slots": jnp.asarray(rng.randn(2, 5, 4, SLOT_SIZE), jnp.float32),
        "vid_len": jnp.asarray([5, 4], jnp.int32),  # 2nd video short
    }
    _, out, losses = _init_and_loss(model, batch)
    assert np.isfinite(float(losses["slot_recon_loss"]))


def test_readout():
    params = _p(model="PhysionReadout", resolution=RES,
                readout_dict=dict(num_slots=4, slot_size=SLOT_SIZE,
                                  agg_func="max", feats_dim=SLOT_SIZE))
    model = build_model(params)
    rng = np.random.RandomState(0)
    batch = {
        "slots": jnp.asarray(rng.randn(2, 6, 4, SLOT_SIZE), jnp.float32),
        "label": jnp.asarray([1, 0], jnp.int32),
    }
    _, out, losses = _init_and_loss(model, batch)
    assert out["logits"].shape == (2,)
    assert np.isfinite(float(losses["vqa_loss"]))
