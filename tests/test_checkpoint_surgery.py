"""Frozen-stage checkpoint grafting: VQ-VAE -> SlotDiffusion's LDM.

The reference wires multi-stage pipelines through the filesystem: a
stage-1 VQ-VAE .pth is loaded frozen into the LDM at model construction
(VQVAE.py:166-178, savi_ldm_movie_params-res128.py:82). Here the graft
happens at Trainer init via `apply_pretrained` (training/checkpoint.py);
this test runs the actual two-stage flow on the CPU mesh:

1. train a tiny VQ-VAE for a few steps, checkpoint it;
2. build SADiffusion with `vqvae_ckp_path` pointing at that checkpoint;
3. assert the composite model's vae subtree equals the stage-1 weights
   and that training leaves the (stop-gradient) vae subtree untouched.
"""

import jax
import numpy as np
import pytest

from slotdiffusion_tpu.data import DataModule, SyntheticImageDataset
from slotdiffusion_tpu.methods import build_method
from slotdiffusion_tpu.models import build_model
from slotdiffusion_tpu.training.checkpoint import (apply_pretrained,
                                                   pretrained_specs)
from slotdiffusion_tpu.utils import BaseParams

RES = (32, 32)


def _vqvae_params(tmpdir):
    p = BaseParams()
    p.model = "VQVAE"
    p.resolution = RES
    p.max_epochs = 1
    p.max_steps = 2
    p.print_iter = 100
    p.lr = 1e-3
    p.clip_grad = -1
    p.warmup_steps_pct = 0.0
    p.train_batch_size = 8
    p.val_batch_size = 8
    p.num_workers = 1
    p.save_interval = 100.0
    p.eval_interval = 1000
    p.enc_dec_dict = dict(resolution=RES[0], in_channels=3, z_channels=3,
                          ch=16, ch_mult=[1, 2], num_res_blocks=1,
                          attn_resolutions=[], out_ch=3, dropout=0.0)
    p.vq_dict = dict(n_embed=64, embed_dim=3, percept_loss_w=0.0)
    p.recon_loss_w = 1.0
    p.quant_loss_w = 1.0
    return p


def _sadiff_params(vq_ckpt):
    p = BaseParams()
    p.model = "SADiffusion"
    p.resolution = RES
    p.max_epochs = 1
    p.max_steps = 2
    p.print_iter = 100
    p.lr = 1e-4
    p.clip_grad = 1.0
    p.warmup_steps_pct = 0.0
    p.train_batch_size = 8
    p.val_batch_size = 8
    p.num_workers = 1
    p.save_interval = 100.0
    p.eval_interval = 1000
    p.slot_dict = dict(num_slots=4, slot_size=32, slot_mlp_size=64,
                       num_iterations=2)
    p.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                      enc_out_channels=32, enc_norm="")
    p.dec_dict = dict(
        resolution=tuple(r // 2 for r in RES),
        unet_dict=dict(in_channels=3, model_channels=16, out_channels=3,
                       num_res_blocks=1, attention_resolutions=(2,),
                       dropout=0.0, channel_mult=(1, 2),
                       num_head_channels=8, context_dim=32),
        vae_dict=dict(
            vae_type="VQVAE",
            enc_dec_dict=dict(resolution=RES[0], in_channels=3,
                              z_channels=3, ch=16, ch_mult=[1, 2],
                              num_res_blocks=1, attn_resolutions=[],
                              out_ch=3, dropout=0.0),
            vq_dict=dict(n_embed=64, embed_dim=3, percept_loss_w=0.0),
            vqvae_ckp_path=vq_ckpt),
        use_ema=False,
        diffusion_dict=dict(pred_target="eps", z_scale_factor=1.0,
                            timesteps=20, beta_schedule="linear",
                            linear_start=0.0015, linear_end=0.0195,
                            log_every_t=10),
        conditioning_key="crossattn",
        cond_stage_key="slots")
    p.loss_dict = dict(use_denoise_loss=True)
    p.denoise_loss_w = 1.0
    return p


def test_two_stage_vqvae_into_sadiffusion(tmp_path):
    # ---- stage 1: train + checkpoint a tiny VQ-VAE ----------------------
    vq_params = _vqvae_params(tmp_path)
    train_set = SyntheticImageDataset(resolution=RES, num_samples=32,
                                     load_mask=False)
    val_set = SyntheticImageDataset(resolution=RES, num_samples=8, seed=1,
                                    load_mask=False)
    dm = DataModule(vq_params, train_set, val_set)
    vq_model = build_model(vq_params)
    method = build_method(model=vq_model, datamodule=dm, params=vq_params,
                          ckp_path=str(tmp_path / "vqvae"))
    method.fit(resume_from=None, san_check_val_step=0)
    vq_trained = jax.device_get(method.state.params)
    ckpt = str(tmp_path / "vqvae" / "ckpt_last")

    # ---- stage 2: SADiffusion with the frozen stage-1 ckpt --------------
    sd_params = _sadiff_params(ckpt)
    assert pretrained_specs(sd_params) == [
        (ckpt, "dm_decoder/vae/vqvae", "")]
    dm2 = DataModule(sd_params, train_set, val_set)
    sd_model = build_model(sd_params)
    method2 = build_method(model=sd_model, datamodule=dm2,
                          params=sd_params, ckp_path=None)
    method2.fit(resume_from=None, san_check_val_step=0)

    # the grafted vae subtree matches stage-1 weights exactly and stayed
    # frozen through 2 train steps (encode/decode are stop_gradient'd)
    sd_trained = jax.device_get(method2.state.params)
    grafted = sd_trained["dm_decoder"]["vae"]["vqvae"]
    flat_a = jax.tree_util.tree_leaves(grafted)
    flat_b = jax.tree_util.tree_leaves(vq_trained)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_apply_pretrained_missing_path_errors():
    cfg = BaseParams()
    cfg.dec_dict = dict(vae_dict=dict(vqvae_ckp_path="/nonexistent/ckpt"))
    with pytest.raises(FileNotFoundError):
        apply_pretrained({"params": {}}, cfg)


def _save_params(path, variables):
    import orbax.checkpoint as ocp
    import os.path as osp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path),
               {"params": jax.device_get(variables["params"])}, force=True)
    ckptr.wait_until_finished()


def test_dvae_graft_into_slate(tmp_path):
    """dVAE stage-1 -> SLATE.dvae (steve.py:78-87 analog)."""
    import jax.numpy as jnp
    dvae_p = BaseParams()
    dvae_p.model = "dVAE"
    dvae_p.resolution = RES
    dvae_p.vocab_size = 64
    dvae_p.dvae_dict = dict(down_factor=4, vocab_size=64)
    dvae = build_model(dvae_p)
    img = jnp.zeros((1, *RES, 3), jnp.float32)
    dvae_vars = dvae.init(
        {"params": jax.random.PRNGKey(0),
         "gumbel": jax.random.PRNGKey(1)},
        {"img": img}, method=dvae.compute_losses)
    ckpt = str(tmp_path / "dvae_ck")
    _save_params(ckpt, dvae_vars)

    slate_p = BaseParams()
    slate_p.model = "SLATE"
    slate_p.resolution = RES
    slate_p.slot_dict = dict(num_slots=4, slot_size=32, slot_mlp_size=64,
                             num_iterations=2)
    slate_p.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                            enc_out_channels=32, enc_norm="")
    slate_p.dec_dict = dict(dec_num_layers=1, dec_num_heads=2,
                            dec_d_model=32)
    slate_p.dvae_dict = dict(down_factor=4, vocab_size=64,
                             dvae_ckp_path=ckpt)
    slate_p.loss_dict = dict(use_img_recon_loss=False)
    slate = build_model(slate_p)
    slate_vars = slate.init(
        {"params": jax.random.PRNGKey(2),
         "gumbel": jax.random.PRNGKey(3)},
        {"img": jnp.zeros((1, *RES, 3), jnp.float32)},
        method=slate.compute_losses)
    grafted = apply_pretrained(slate_vars, slate_p)
    a = jax.tree_util.tree_leaves(grafted["params"]["dvae"])
    b = jax.tree_util.tree_leaves(dvae_vars["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dm_graft_into_ldmslotformer(tmp_path):
    """Trained SAViDiffusion's dm_decoder -> LDMSlotFormer's frozen LDM
    (ldm_slotformer.py:111-134 analog)."""
    import jax.numpy as jnp
    sd_p = _sadiff_params("")
    sd_p.model = "SAViDiffusion"
    sd_p.pred_dict = dict(pred_type="mlp", pred_rnn=False,
                          pred_norm_first=True, pred_sg_every=None)
    sd_p.n_sample_frames = 2
    sd = build_model(sd_p)
    vid = jnp.zeros((1, 2, *RES, 3), jnp.float32)
    sd_vars = sd.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        {"img": vid}, method=sd.compute_losses)
    ckpt = str(tmp_path / "sd_ck")
    _save_params(ckpt, sd_vars)

    lf_p = BaseParams()
    lf_p.model = "LDMSlotFormer"
    lf_p.resolution = RES
    lf_p.clip_len = 5
    lf_p.slot_dict = dict(num_slots=4, slot_size=32)
    lf_p.rollout_dict = dict(num_slots=4, slot_size=32, history_len=3,
                             t_pe="sin", slots_pe="", d_model=32,
                             num_layers=1, num_heads=2, ffn_dim=64,
                             norm_first=True)
    lf_p.dec_dict = dict(sd_p.dec_dict)
    lf_p.dec_dict["dm_ckp_path"] = ckpt
    lf_p.loss_dict = dict(rollout_len=2, use_img_recon_loss=False)
    lf = build_model(lf_p)
    slots = jnp.zeros((1, 5, 4, 32), jnp.float32)
    lf_vars = lf.init(
        {"params": jax.random.PRNGKey(2),
         "diffusion": jax.random.PRNGKey(3)},
        {"slots": slots}, method=lf.compute_losses)
    grafted = apply_pretrained(lf_vars, lf_p)
    a = jax.tree_util.tree_leaves(grafted["params"]["dm_decoder"])
    b = jax.tree_util.tree_leaves(sd_vars["params"]["dm_decoder"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
