"""SLATE (image) and STEVE (video) baselines.

TPU-native rebuild of the reference img_based/models/slate/slate.py and
video_based/models/steve/steve.py: SA/SAVi encoder (WMask variant for STEVE)
+ frozen dVAE tokenizer + GPT-style autoregressive transformer decoder over
token ids, trained with token cross-entropy (steve.py:219-231,
slate.py:150-161). Optional pixel recon loss through a soft gumbel decode
(steve.py:203-214). Slow AR `recon_img` uses the KV-cached scan generator
(ar_decoder.py) instead of the reference's per-token full forwards
(steve.py:239-270).

The dVAE is frozen: its checkpoint is grafted in via
training/checkpoint.py:load_pretrained_subtree and all dVAE calls are under
stop_gradient (reference freezes via requires_grad=False, steve.py:84-87).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ar_decoder import SLATETransformerDecoder, STEVETransformerDecoder
from .blocks import gumbel_softmax
from .dvae import DVAE
from .sa import SAEncoder
from .savi import SAVi
from .slot_attention import SlotAttention

Dtype = Any


class SLATE(nn.Module):
    """SLATE image model (slate.py:22-200)."""

    resolution: Tuple[int, int]
    slot_dict: Dict
    enc_dict: Dict
    dec_dict: Dict
    dvae_dict: Dict
    loss_dict: Dict
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

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
        self.vocab_size = self.dvae_dict["vocab_size"]
        self.down_factor = self.dvae_dict.get("down_factor", 4)
        self.dvae = DVAE(vocab_size=self.vocab_size, img_channels=3,
                         dtype=self.dtype, name="dvae")
        H, W = self.resolution
        self.h, self.w = H // self.down_factor, W // self.down_factor
        self.num_patches = self.h * self.w
        self.trans_decoder = SLATETransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=self.dec_dict["dec_d_model"],
            n_head=self.dec_dict["dec_num_heads"],
            max_len=self.num_patches - 1,
            num_slots=self.num_slots,
            num_layers=self.dec_dict["dec_num_layers"],
            dtype=self.dtype,
            name="trans_decoder")

    def encode(self, img, train=True):
        feats, vis_res = self.encoder(img)
        init_slots = jnp.tile(
            self.init_latents.astype(self.dtype), (img.shape[0], 1, 1))
        slots, masks = self.slot_attention(feats, init_slots)
        masks = masks.reshape(*masks.shape[:2], *vis_res)
        return slots, masks

    def __call__(self, data_dict, train=True, testing=False):
        img = data_dict["img"]
        slots, masks = self.encode(img, train=train)
        out = {"slots": slots, "masks": masks}
        if testing:
            return out
        token_id = data_dict.get("token_id", None)
        if token_id is None:
            token_id = jax.lax.stop_gradient(
                self.dvae.tokenize(img, one_hot=False))
        target = token_id.reshape(img.shape[0], -1)  # [B, h*w]
        logits = self.trans_decoder(slots, target[:, :-1])
        out["pred_token_id"] = logits[:, -self.num_patches:]
        out["target_token_id"] = target
        if self.is_initializing():
            # flax creates params only for executed paths — the dVAE
            # decoder runs only in recon_img; its params must exist for
            # checkpoint grafting and eval apply
            self.dvae.detokenize(jax.nn.one_hot(
                target[:, :self.num_patches].reshape(
                    -1, self.h, self.w), self.vocab_size))
        return out

    def compute_losses(self, data_dict, sched=None, train=True,
                       testing=False):
        out = self(data_dict, train=train, testing=testing)
        logits = out["pred_token_id"].reshape(-1, self.vocab_size)
        target = out["target_token_id"].reshape(-1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, target[:, None], axis=-1).mean()
        return out, {"token_recon_loss": ce}

    def recon_img(self, slots, rng=None):
        """AR token generation -> dVAE detokenize (slate.py:168-191)."""
        _, logits = self.trans_decoder.generate(
            slots, steps=self.num_patches, sample=False, rng=rng)
        idx = jnp.argmax(logits, axis=-1)  # [B, h*w]
        z_hard = jax.nn.one_hot(idx, self.vocab_size).reshape(
            slots.shape[0], self.h, self.w, self.vocab_size)
        return self.dvae.detokenize(z_hard)


class STEVE(nn.Module):
    """STEVE video model (steve.py:23-279)."""

    resolution: Tuple[int, int]
    slot_dict: Dict
    enc_dict: Dict
    dec_dict: Dict
    dvae_dict: Dict
    pred_dict: Dict
    loss_dict: Dict
    clip_len: int = 6
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    def setup(self):
        self.num_slots = self.slot_dict["num_slots"]
        self.slot_size = self.slot_dict["slot_size"]
        self.savi = SAVi(
            resolution=tuple(self.resolution),
            slot_dict=self.slot_dict,
            enc_dict=self.enc_dict,
            dec_dict={},
            pred_dict=self.pred_dict,
            loss_dict=self.loss_dict,
            clip_len=self.clip_len,
            eps=self.eps,
            return_mask=True,
            dtype=self.dtype,
            name="savi")
        self.vocab_size = self.dvae_dict["vocab_size"]
        self.down_factor = self.dvae_dict.get("down_factor", 4)
        self.dvae = DVAE(vocab_size=self.vocab_size, img_channels=3,
                         dtype=self.dtype, name="dvae")
        H, W = self.resolution
        self.h, self.w = H // self.down_factor, W // self.down_factor
        self.num_patches = self.h * self.w
        self.trans_decoder = STEVETransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=self.dec_dict["dec_d_model"],
            n_head=self.dec_dict["dec_num_heads"],
            max_len=self.num_patches - 1,
            num_slots=self.num_slots,
            num_layers=self.dec_dict["dec_num_layers"],
            dtype=self.dtype,
            name="trans_decoder")
        self.use_img_recon_loss = self.loss_dict.get(
            "use_img_recon_loss", False)

    def encode(self, img, prev_slots=None, train=True):
        slots, masks, vis_res = self.savi.encode(img, prev_slots=prev_slots)
        B, T, N = masks.shape[:3]
        masks = masks.reshape(B, T, N, *vis_res)
        return slots, masks

    def __call__(self, data_dict, prev_slots=None, train=True,
                 testing=False):
        img = data_dict["img"]  # [B, T, H, W, 3]
        B, T = img.shape[:2]
        slots, masks = self.encode(img, prev_slots=prev_slots, train=train)
        out = {"slots": slots, "masks": masks}
        if testing:
            return out
        token_id = data_dict.get("token_id", None)
        if token_id is None:
            token_id = jax.lax.stop_gradient(
                self.dvae.tokenize(img, one_hot=False))
        target = token_id.reshape(B * T, -1)  # [B*T, h*w]
        in_slots = slots.reshape(B * T, self.num_slots, self.slot_size)
        logits = self.trans_decoder(in_slots, target[:, :-1])
        out["pred_token_id"] = logits[:, -self.num_patches:]
        out["target_token_id"] = target
        if self.use_img_recon_loss:
            # soft gumbel decode for a pixel loss (steve.py:203-214)
            z_logits = jax.nn.log_softmax(out["pred_token_id"], axis=-1)
            rng = self.make_rng("gumbel")
            z = gumbel_softmax(rng, z_logits, tau=0.1, hard=False, axis=-1)
            z = z.reshape(B * T, self.h, self.w, self.vocab_size)
            out["recon_img"] = self.dvae.detokenize(z)
            out["gt_img"] = img.reshape(B * T, *img.shape[2:])
        elif self.is_initializing():
            # ensure the sampling-only dVAE decoder gets params at init
            self.dvae.detokenize(jax.nn.one_hot(
                target[:, :self.num_patches].reshape(
                    -1, self.h, self.w), self.vocab_size))
        return out

    def compute_losses(self, data_dict, sched=None, train=True,
                       testing=False):
        out = self(data_dict, train=train, testing=testing)
        logits = out["pred_token_id"].reshape(-1, self.vocab_size)
        target = out["target_token_id"].reshape(-1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, target[:, None], axis=-1).mean()
        losses = {"token_recon_loss": ce}
        if self.use_img_recon_loss:
            losses["img_recon_loss"] = jnp.mean(
                (out["recon_img"].astype(jnp.float32) -
                 out["gt_img"].astype(jnp.float32)) ** 2)
        return out, losses

    def recon_img(self, slots, rng=None):
        """slots: [B, T, N, D] or [B, N, D] -> AR-generated frames."""
        shp = slots.shape
        if slots.ndim == 4:
            slots = slots.reshape(-1, shp[-2], shp[-1])
        _, logits = self.trans_decoder.generate(
            slots, steps=self.num_patches, sample=False, rng=rng)
        idx = jnp.argmax(logits, axis=-1)
        z_hard = jax.nn.one_hot(idx, self.vocab_size).reshape(
            slots.shape[0], self.h, self.w, self.vocab_size)
        imgs = self.dvae.detokenize(z_hard)
        if len(shp) == 4:
            imgs = imgs.reshape(shp[0], shp[1], *imgs.shape[1:])
        return imgs
