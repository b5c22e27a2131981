"""SlotDiffusion models: SADiffusion (image) and SAViDiffusion (video).

TPU-native rebuild of the reference img_based/models/sa_diffusion.py and
video_based/models/savi_diffusion.py: SA/SAVi encoder with the
`SlotAttentionWMask` variant (masks = last-iteration attention,
sa_diffusion.py:39-70), decoder = slot-conditioned CondDDPM or LDM; the
training loss is purely the DM denoising loss on slots-conditioned
diffusion (sa_diffusion.py:206-213, savi_diffusion.py:252-264).

Video case: the DM decodes B*T flattened frames, each conditioned on its own
frame's slots (savi_diffusion.py:252-264). Masks are produced by the
attention, not the decoder (:229-250); at eval they are bilinearly upsampled
from the visual resolution to full resolution (:204-213).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .diffusion import LDM, CondDDPM
from .sa import SAEncoder
from .savi import SAVi
from .slot_attention import SlotAttention

Dtype = Any


def _upsample_masks(masks, vis_res, out_res):
    """masks: [B, N, h*w] -> [B, N, H, W] bilinear (sa_diffusion.py:172-181)."""
    B, N = masks.shape[:2]
    m = masks.reshape(B * N, *vis_res, 1)
    m = jax.image.resize(m, (B * N, *out_res, 1), method="bilinear")
    return m.reshape(B, N, *out_res)


def _build_dm_decoder(dec_dict, dtype):
    """LDM when a `vae_dict` is present, else CondDDPM
    (sa_diffusion.py:141-148)."""
    dd = dict(dec_dict)
    resolution = tuple(dd["resolution"])
    if dd.get("vae_dict", None):
        return LDM(
            resolution=resolution,
            unet_dict=dd["unet_dict"],
            vae_dict=dd["vae_dict"],
            diffusion_dict=dd.get("diffusion_dict", {}),
            conditioning_key=dd.get("conditioning_key", "crossattn"),
            cond_stage_key=dd.get("cond_stage_key", "slots"),
            use_ema=dd.get("use_ema", True),
            dtype=dtype,
            name="dm_decoder")
    return CondDDPM(
        resolution=resolution,
        unet_dict=dd["unet_dict"],
        diffusion_dict=dd.get("diffusion_dict", {}),
        conditioning_key=dd.get("conditioning_key", "crossattn"),
        cond_stage_key=dd.get("cond_stage_key", "slots"),
        use_ema=dd.get("use_ema", True),
        dtype=dtype,
        name="dm_decoder")


class SADiffusion(nn.Module):
    """SlotDiffusion on images (sa_diffusion.py:73-247)."""

    resolution: Tuple[int, int]
    slot_dict: Dict
    enc_dict: Dict
    dec_dict: Dict
    loss_dict: Dict
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    # EMA subtree handled by the Trainer (reference keeps a LitEma over the
    # DM only, ddpm.py:57-60)
    ema_filter_prefix = "dm_decoder"

    @property
    def use_ema(self):
        return self.dec_dict.get("use_ema", False)

    def setup(self):
        sd = self.slot_dict
        self.num_slots = sd["num_slots"]
        self.slot_size = sd["slot_size"]
        self.init_latents = self.param(
            "init_latents", nn.initializers.normal(1.0),
            (1, self.num_slots, self.slot_size))
        self.slot_attention = SlotAttention(
            num_iterations=sd["num_iterations"],
            slot_size=self.slot_size,
            mlp_hidden_size=sd["slot_mlp_size"],
            eps=self.eps,
            return_last_attn=True,
            dtype=self.dtype)
        self.encoder = SAEncoder(
            resolution=tuple(self.resolution),
            enc_dict=self.enc_dict,
            enc_out_channels=self.enc_dict["enc_out_channels"],
            dtype=self.dtype)
        self.dm_decoder = _build_dm_decoder(self.dec_dict, self.dtype)

    def encode(self, img, init_slots=None, train=True):
        feats, vis_res = self.encoder(img)
        if init_slots is None:
            init_slots = jnp.tile(
                self.init_latents.astype(self.dtype), (img.shape[0], 1, 1))
        slots, masks = self.slot_attention(feats, init_slots)
        if not train and vis_res != tuple(self.resolution):
            masks = _upsample_masks(masks, vis_res, tuple(self.resolution))
        else:
            masks = masks.reshape(*masks.shape[:2], *vis_res)
        return slots, masks

    def __call__(self, data_dict, train=True, testing=False):
        img = data_dict["img"]
        slots, masks = self.encode(img, train=train)
        return {"slots": slots, "masks": masks}

    def compute_losses(self, data_dict, sched=None, train=True,
                       testing=False):
        out = self(data_dict, train=train, testing=testing)
        losses = self.dm_decoder.loss_function(
            data_dict["img"], context=out["slots"], train=train)
        return out, losses

    def log_images(self, data_dict, rng, use_dpm=True, same_noise=False,
                   ret_intermed=False, **kwargs):
        """Slot-conditioned reconstruction (sa_diffusion.py:230-242).

        `ret_intermed=True` additionally returns the denoising trajectory
        (the reference's `log_diffusion_rows`, img_based/method.py:320-376)
        — DDIM is used for the row since DPM-Solver exposes no
        intermediates.
        """
        out = self(data_dict, train=False)
        samples = self.dm_decoder.generate_imgs(
            rng, cond=out["slots"], use_dpm=use_dpm and not ret_intermed,
            use_ddim=ret_intermed, same_noise=same_noise,
            ret_intermed=ret_intermed, **kwargs)
        intermed = None
        if ret_intermed:
            samples, intermed = samples
        if isinstance(self.dm_decoder, LDM):
            samples = self.dm_decoder.decode_latent(samples)
            if intermed is not None:
                K = intermed.shape[0]
                flat = intermed.reshape(-1, *intermed.shape[2:])
                dec = self.dm_decoder.decode_latent(flat)
                intermed = dec.reshape(K, -1, *dec.shape[1:])
        ret = {"samples": samples, "masks": out["masks"],
               "slots": out["slots"]}
        if intermed is not None:
            ret["intermed"] = intermed  # [K, B, H, W, 3], x_T -> x_0
        return ret


class SAViDiffusion(nn.Module):
    """SlotDiffusion on videos (savi_diffusion.py:74-302): SAVi recurrence
    with WMask slot attention; DM over flattened B*T frames."""

    resolution: Tuple[int, int]
    slot_dict: Dict
    enc_dict: Dict
    dec_dict: Dict
    pred_dict: Dict
    loss_dict: Dict
    clip_len: int = 6
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    ema_filter_prefix = "dm_decoder"

    @property
    def use_ema(self):
        return self.dec_dict.get("use_ema", False)

    def setup(self):
        self.savi = SAVi(
            resolution=tuple(self.resolution),
            slot_dict=self.slot_dict,
            enc_dict=self.enc_dict,
            dec_dict={},  # no spatial-broadcast decoder
            pred_dict=self.pred_dict,
            loss_dict=self.loss_dict,
            clip_len=self.clip_len,
            eps=self.eps,
            return_mask=True,
            dtype=self.dtype,
            name="savi")
        self.dm_decoder = _build_dm_decoder(self.dec_dict, self.dtype)
        self.num_slots = self.slot_dict["num_slots"]
        self.slot_size = self.slot_dict["slot_size"]

    def encode(self, img, prev_slots=None, train=True):
        slots, masks, vis_res = self.savi.encode(img, prev_slots=prev_slots)
        B, T, N = masks.shape[:3]
        if not train and vis_res != tuple(self.resolution):
            m = _upsample_masks(
                masks.reshape(B * T, N, -1), vis_res,
                tuple(self.resolution))
            masks = m.reshape(B, T, N, *self.resolution)
        else:
            masks = masks.reshape(B, T, N, *vis_res)
        return slots, masks

    def __call__(self, data_dict, prev_slots=None, train=True,
                 testing=False):
        img = data_dict["img"]  # [B, T, H, W, 3]
        slots, masks = self.encode(img, prev_slots=prev_slots, train=train)
        return {"slots": slots, "masks": masks}

    def compute_losses(self, data_dict, sched=None, train=True,
                       testing=False):
        out = self(data_dict, train=train, testing=testing)
        img = data_dict["img"]
        B, T = img.shape[:2]
        # fold T into batch for the DM decoder (savi_diffusion.py:252-264)
        flat_img = img.reshape(B * T, *img.shape[2:])
        flat_slots = out["slots"].reshape(
            B * T, self.num_slots, self.slot_size)
        losses = self.dm_decoder.loss_function(
            flat_img, context=flat_slots, train=train)
        return out, losses

    def log_images(self, data_dict, rng, use_dpm=True, same_noise=True,
                   **kwargs):
        """Video reconstruction; `same_noise=True` for temporal consistency
        (video_based/method.py:448-457)."""
        out = self(data_dict, train=False)
        img = data_dict["img"]
        B, T = img.shape[:2]
        flat_slots = out["slots"].reshape(
            B * T, self.num_slots, self.slot_size)
        samples = self.dm_decoder.generate_imgs(
            rng, cond=flat_slots, use_dpm=use_dpm, same_noise=same_noise,
            **kwargs)
        if isinstance(self.dm_decoder, LDM):
            samples = self.dm_decoder.decode_latent(samples)
        samples = samples.reshape(B, T, *samples.shape[1:])
        return {"samples": samples, "masks": out["masks"],
                "slots": out["slots"]}
