"""Gaussian diffusion decoders: DDPM, CondDDPM, LDM.

TPU-native rebuild of the reference's diffusion stack
(video_based/models/ddpm/ddpm.py, cond_ddpm.py, ldm.py):

- q/p distributions from static schedule tables (schedules.py)
- training loss: sample t ~ U[0, T), noise, x_t; UNet predicts eps/x0/v;
  MSE (cond_ddpm.py:214-235, ldm.py:59-83)
- ancestral sampling as ONE `lax.scan` over timesteps — the whole
  1000-step chain compiles to a single XLA while-program instead of a
  Python loop with per-step dispatch (reference cond_ddpm.py:100-132)
- DDIM sampling over a static timestep subset, eta-parameterized, with the
  `same_noise` repeat trick for temporal consistency (ddim.py:36-218)
- DPM-Solver++ fast sampling lives in ops/dpm_solver.py and is dispatched
  from `generate_imgs` (cond_ddpm.py:154-193)
- LDM: diffusion in a frozen VQ-VAE latent space; `clip_denoised=False`,
  `vq_denoised=True` — the quantizer acts as the x0 correcting function
  (ldm.py:55-57); VAE encode is stop-gradient (ldm.py:62-64)

Conditioning: None / 'concat' / 'crossattn' routing matches
DiffusionWrapper (ddpm.py:336-363). EMA is handled by the Trainer
(training/ema.py), not inside the module.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dpm_solver import dpm_solver_sample
from .schedules import (make_ddim_sampling_parameters, make_ddim_timesteps,
                        make_gaussian_schedule)
from .unet import UNetModel

Dtype = Any


def _extract(table, t, ndim):
    """table: [T] np/jnp array; t: [B] int; -> [B, 1, 1, ...] (ndim dims)."""
    out = jnp.asarray(table)[t]
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


def _dynamic_thresholding(x0, ratio=0.995, max_val=1.0):
    """Imagen dynamic thresholding (reference dpm_solver.py:507-517):
    per-sample 99.5% quantile of |x0| (floored at max_val), clamp to
    [-s, s], rescale to [-1, 1]."""
    flat = jnp.abs(x0).reshape(x0.shape[0], -1)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.maximum(s, max_val)
    s = s.reshape(x0.shape[0], *([1] * (x0.ndim - 1)))
    return jnp.clip(x0, -s, s) / s


def noise_like(rng, shape, same_noise=False, dtype=jnp.float32):
    """Batch noise; `same_noise=True` repeats one sample across the batch
    (reference ddpm/utils.py:125-129) for temporally-consistent video
    decoding."""
    if same_noise:
        n = jax.random.normal(rng, (1, *shape[1:]), dtype)
        return jnp.broadcast_to(n, shape)
    return jax.random.normal(rng, shape, dtype)


class CondDDPM(nn.Module):
    """(Conditionally) denoising diffusion in pixel or latent space.

    Config keys mirror the reference `dec_dict`
    (savi_ldm_movie_params-res128.py:102-121). With `conditioning_key=None`
    this is the unconditional DDPM (ddpm.py:27).
    """

    resolution: Tuple[int, int]
    unet_dict: Dict
    diffusion_dict: Dict
    conditioning_key: Optional[str] = "crossattn"
    cond_stage_key: str = "slots"
    use_ema: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        d = dict(self.diffusion_dict)
        self.pred_target = d.get("pred_target", "eps")
        assert self.pred_target in ("eps", "x0", "v")
        self.log_every_t = d.get("log_every_t", 200)
        self.schedule = make_gaussian_schedule(
            schedule=d.get("beta_schedule", "linear"),
            timesteps=d.get("timesteps", 1000),
            linear_start=d.get("linear_start", 1e-4),
            linear_end=d.get("linear_end", 2e-2),
            cosine_s=d.get("cosine_s", 8e-3),
        )
        self.num_timesteps = self.schedule.num_timesteps
        ud = dict(self.unet_dict)
        if self.conditioning_key == "concat":
            ud["context_dim"] = None
        self.channels = self.unet_dict.get("in_channels", 3)
        self.unet = UNetModel(
            in_channels=ud.get("in_channels", 3),
            model_channels=ud["model_channels"],
            out_channels=ud["out_channels"],
            num_res_blocks=ud["num_res_blocks"],
            attention_resolutions=tuple(ud["attention_resolutions"]),
            dropout=ud.get("dropout", 0.0),
            channel_mult=tuple(ud.get("channel_mult", (1, 2, 4, 8))),
            conv_resample=ud.get("conv_resample", True),
            use_checkpoint=ud.get("use_checkpoint", False),
            num_head_channels=ud.get("num_head_channels", 32),
            resblock_updown=ud.get("resblock_updown", False),
            transformer_depth=ud.get("transformer_depth", 1),
            context_dim=ud.get("context_dim", None),
            attn_backend=ud.get("attn_backend", "einsum"),
            attn_softmax=ud.get("attn_softmax", "fast"),
            fused_gn=ud.get("fused_gn", False),
            conv_out_compute=ud.get("conv_out_compute", "f32"),
            dtype=self.dtype,
        )

    # sampling-space properties; overridden by LDM
    @property
    def clip_denoised(self):
        return True

    @property
    def vq_denoised(self):
        return False

    # ------------------------------------------------------------------
    # model forward with conditioning routing (ddpm.py:346-363)
    # ------------------------------------------------------------------

    def denoise(self, x, t, context=None, train=False):
        if self.conditioning_key is None:
            return self.unet(x, t, train=train)
        assert context is not None, "conditioning data required"
        if self.conditioning_key == "concat":
            # context must be spatial [B, H, W, C]
            xc = jnp.concatenate([x, context], axis=-1)
            return self.unet(xc, t, train=train)
        if self.conditioning_key == "crossattn":
            return self.unet(x, t, context=context, train=train)
        raise ValueError(self.conditioning_key)

    __call__ = denoise

    # ------------------------------------------------------------------
    # q / p math (ddpm.py:149-205)
    # ------------------------------------------------------------------

    def q_sample(self, x0, t, noise):
        """Sample x_t ~ q(x_t | x_0)."""
        s = self.schedule
        return (_extract(s.sqrt_alphas_bar, t, x0.ndim) * x0 +
                _extract(s.sqrt_one_minus_alphas_bar, t, x0.ndim) * noise)

    def predict_x0_from_eps(self, x_t, t, eps):
        s = self.schedule
        return (_extract(s.sqrt_recip_alphas_bar, t, x_t.ndim) * x_t -
                _extract(s.sqrt_recipm1_alphas_bar, t, x_t.ndim) * eps)

    def q_posterior(self, x0, x_t, t):
        s = self.schedule
        mean = (_extract(s.posterior_mean_coef1, t, x_t.ndim) * x0 +
                _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t)
        logvar = _extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, logvar

    def _correct_x0(self, x0):
        """x0 correction: clip in pixel space (ddpm.py:189-190); the LDM
        subclass quantizes instead (cond_ddpm.py:74-75)."""
        if self.clip_denoised:
            return jnp.clip(x0, -1.0, 1.0)
        return x0

    def _pred_to_x0(self, pred, x, t):
        if self.pred_target == "eps":
            return self.predict_x0_from_eps(x, t, pred)
        if self.pred_target == "v":
            s = self.schedule
            alpha_t = _extract(s.sqrt_alphas_bar, t, x.ndim)
            sigma_t = _extract(s.sqrt_one_minus_alphas_bar, t, x.ndim)
            return alpha_t * x - sigma_t * pred
        return pred

    # ------------------------------------------------------------------
    # training loss (cond_ddpm.py:214-235, ddpm.py:258-268)
    # ------------------------------------------------------------------

    def loss_function(self, x0, context=None, train=True):
        B = x0.shape[0]
        rng = self.make_rng("diffusion")
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (B,), 0, self.num_timesteps)
        noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
        x_noisy = self.q_sample(x0, t, noise)
        pred = self.denoise(x_noisy, t, context=context, train=train)
        if self.pred_target == "eps":
            gt = noise
        elif self.pred_target == "v":
            s = self.schedule
            alpha_t = _extract(s.sqrt_alphas_bar, t, x0.ndim)
            sigma_t = _extract(s.sqrt_one_minus_alphas_bar, t, x0.ndim)
            gt = alpha_t * noise - sigma_t * x0
        else:
            gt = x0
        gt = jax.lax.stop_gradient(gt)
        return {"denoise_loss": jnp.mean(
            (pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2)}

    # ------------------------------------------------------------------
    # ancestral sampling — one lax.scan over all T steps
    # ------------------------------------------------------------------

    def sample_ancestral(self, rng, cond=None, batch_size=None,
                         same_noise=False, ret_intermed=False, x_T=None):
        """Full-chain ancestral sampling (cond_ddpm.py:100-132).
        `x_T` optionally pins the initial noise (reproducible eval /
        reference-parity)."""
        B = batch_size or (cond.shape[0] if cond is not None else 1)
        shape = (B, *self.resolution, self.channels)
        rng, init_rng = jax.random.split(rng)
        if x_T is None:
            x_T = noise_like(init_rng, shape, same_noise)

        def step(carry, t):
            x, rng = carry
            rng, step_rng = jax.random.split(rng)
            tb = jnp.full((B,), t, jnp.int32)
            pred = self.denoise(x, tb, context=cond)
            x0 = self._correct_x0(self._pred_to_x0(pred, x, tb))
            mean, logvar = self.q_posterior(x0, x, tb)
            noise = noise_like(step_rng, x.shape, same_noise)
            mask = (t > 0).astype(x.dtype)
            x_next = mean + mask * jnp.exp(0.5 * logvar) * noise
            y = x_next if ret_intermed else 0
            return (x_next, rng), y

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), inter = jax.lax.scan(step, (x_T, rng), ts)
        if ret_intermed:
            idx = np.arange(0, self.num_timesteps, self.log_every_t)
            # scan emits in descending-t order; pick logged steps
            keep = (self.num_timesteps - 1) - idx[::-1]
            inter = jnp.concatenate([x_T[None], inter[keep]], axis=0)
            return x, inter
        return x

    # ------------------------------------------------------------------
    # DDIM sampling (ddim.py)
    # ------------------------------------------------------------------

    def sample_ddim(self, rng, cond=None, batch_size=None, steps=200,
                    eta=0.0, same_noise=False, ret_intermed=False,
                    x_T=None):
        B = batch_size or (cond.shape[0] if cond is not None else 1)
        shape = (B, *self.resolution, self.channels)
        rng, init_rng = jax.random.split(rng)
        if x_T is None:
            x_T = noise_like(init_rng, shape, same_noise)

        steps = min(steps, self.num_timesteps)  # tiny-T configs/tests
        tsteps = make_ddim_timesteps(steps, self.num_timesteps)
        tsteps = np.clip(tsteps, 0, self.num_timesteps - 1)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            np.asarray(self.schedule.alphas_bar, np.float64), tsteps, eta)

        def step(carry, inputs):
            x, rng = carry
            t, a_t, a_prev, sigma = inputs
            rng, step_rng = jax.random.split(rng)
            tb = jnp.full((B,), t, jnp.int32)
            pred = self.denoise(x, tb, context=cond)
            x0 = self._pred_to_x0(pred, x, tb)
            # e_t comes from the UNCORRECTED x0 — the reference keeps the
            # raw model eps for dir_xt and only corrects the x0 term
            # (ddim.py:198-216)
            eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
            x0 = self._correct_x0(x0)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) \
                * eps
            noise = sigma * noise_like(step_rng, x.shape, same_noise)
            x_prev = jnp.sqrt(a_prev) * x0 + dir_xt + noise
            y = x_prev if ret_intermed else 0
            return (x_prev, rng), y

        seq = (jnp.asarray(tsteps[::-1].copy(), jnp.int32),
               jnp.asarray(alphas[::-1].copy()),
               jnp.asarray(alphas_prev[::-1].copy()),
               jnp.asarray(sigmas[::-1].copy()))
        (x, _), inter = jax.lax.scan(step, (x_T, rng), seq)
        if ret_intermed:
            keep = np.arange(0, len(tsteps),
                             max(len(tsteps) // 5, 1))
            inter = jnp.concatenate([x_T[None], inter[keep]], axis=0)
            return x, inter
        return x

    # ------------------------------------------------------------------
    # DPM-Solver++ fast sampling (cond_ddpm.py:154-193)
    # ------------------------------------------------------------------

    def sample_dpm(self, rng, cond=None, batch_size=None, steps=None,
                   order=3, same_noise=False, x_T=None):
        B = batch_size or (cond.shape[0] if cond is not None else 1)
        shape = (B, *self.resolution, self.channels)
        if x_T is None:
            x_T = noise_like(rng, shape, same_noise)
        steps = steps or max(20, self.num_timesteps // 50)

        def model_fn(x, t_cont):
            # continuous time in (0, 1] -> model input time. The reference
            # hardcodes the *1000 scale regardless of total_N
            # (dpm_solver.py:339-346: (t - 1/total_N) * 1000), so we must too
            # for exact parity at any timestep count.
            tb = (t_cont - 1.0 / self.num_timesteps) * 1000.0
            tb = jnp.broadcast_to(tb, (B,))
            return self.denoise(x, tb, context=cond)

        correcting_fn = None
        if self.clip_denoised:
            # In the DPM path clip_denoised=True selects Imagen dynamic
            # thresholding, NOT a plain clamp (dpm_solver.py:495-520).
            correcting_fn = _dynamic_thresholding
        elif self.vq_denoised:
            correcting_fn = self._vq_correct

        return dpm_solver_sample(
            model_fn,
            np.asarray(self.schedule.betas, np.float64),
            x_T,
            steps=steps,
            order=order,
            model_type=self.pred_target,
            correcting_x0_fn=correcting_fn,
        )

    def _vq_correct(self, x0):  # overridden by LDM
        raise NotImplementedError

    def generate_imgs(self, rng, cond=None, batch_size=None, use_dpm=False,
                      use_ddim=False, same_noise=False, ret_intermed=False,
                      x_T=None):
        """Sampling dispatch, matching cond_ddpm.py:134-212: DPM-Solver
        (steps=max(20, T/50), order 3) > DDIM (steps=max(200, T/5)) >
        ancestral."""
        if use_dpm:
            x = self.sample_dpm(rng, cond=cond, batch_size=batch_size,
                                same_noise=same_noise, x_T=x_T)
            return (x, None) if ret_intermed else x
        if use_ddim:
            return self.sample_ddim(
                rng, cond=cond, batch_size=batch_size,
                steps=max(200, self.num_timesteps // 5),
                same_noise=same_noise, ret_intermed=ret_intermed, x_T=x_T)
        return self.sample_ancestral(
            rng, cond=cond, batch_size=batch_size, same_noise=same_noise,
            ret_intermed=ret_intermed, x_T=x_T)


class DDPM(CondDDPM):
    """Unconditional pixel-space DDPM (ddpm.py:27-333)."""

    conditioning_key: Optional[str] = None

    def loss_function(self, x0, context=None, train=True):
        assert context is None
        return super().loss_function(x0, None, train=train)


class LDM(CondDDPM):
    """Latent diffusion over a frozen VQ-VAE (ldm.py:18-137).

    The VAE lives in this module's param tree under 'vae'; its checkpoint is
    grafted in via `training/checkpoint.py:load_pretrained_subtree` and its
    params receive no gradient (encode/decode wrapped in stop_gradient).
    """

    vae_dict: Optional[Dict] = None

    def setup(self):
        super().setup()
        assert self.vae_dict is not None
        from .vqvae import VQVAEWrapper
        vd = dict(self.vae_dict)
        vd.pop("vae_type", None)
        vd.pop("vqvae_ckp_path", None)
        scale = self.diffusion_dict.get("z_scale_factor", 1.0)
        self.vae = VQVAEWrapper(
            enc_dec_dict=vd["enc_dec_dict"],
            vq_dict=vd["vq_dict"],
            scale_factor=scale,
            dtype=self.dtype,
        )

    @property
    def clip_denoised(self):
        return False  # latent values are unbounded (ldm.py:56)

    @property
    def vq_denoised(self):
        return True  # quantize-as-denoise (ldm.py:57)

    def _vq_correct(self, x0):
        return jax.lax.stop_gradient(self.vae.quantize(x0))

    def encode_latent(self, img):
        return jax.lax.stop_gradient(self.vae.encode(img))

    def decode_latent(self, z):
        return jax.lax.stop_gradient(self.vae.decode(z))

    def loss_function(self, img, context=None, train=True):
        """VAE-encode (no grad) then denoise in latent space (ldm.py:59-83).
        Takes the *image*; the latent x0 is computed inside."""
        x0 = self.encode_latent(img)
        if self.is_initializing():
            # flax creates params only for executed paths; the VAE decoder
            # and quantizer run only at sampling time, but their params
            # must exist so stage-1 checkpoint grafting and eval-time
            # apply see the full tree
            self.vae.quantize(x0)
            self.vae.decode(x0)
        return super().loss_function(x0, context=context, train=train)

    def _correct_x0(self, x0):
        return self._vq_correct(x0)
