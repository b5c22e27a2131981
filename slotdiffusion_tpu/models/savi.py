"""SAVi — video Slot Attention with temporal slot carry-over.

TPU-native rebuild of the reference SAVi (video_based/models/savi.py:
150-565): per-frame Slot Attention where each frame's slot init is the
predictor-transitioned previous-frame slots (:366-397); spatial-broadcast
decoder over flattened B*T frames (:477-498); MSE recon loss.

TPU re-design of the temporal loop: `nn.scan` over frames with carry
(prev_slots, predictor RNN state) — one compiled step reused T times instead
of a Python loop. The reference's CUDA-OOM-probing adaptive clip length
(:402-443) is replaced by a *static* `clip_len`: long videos are processed
in fixed-size chunks at the host level with slot carry-over between chunks
(see `methods/video.py`), keeping all shapes static for XLA.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .predictor import build_predictor
from .sa import SAEncoder, SpatialBroadcastDecoder
from .slot_attention import SlotAttention

Dtype = Any


class SAViStep(nn.Module):
    """One frame step: predictor(prev_slots) -> SlotAttention(feat, init).

    `with_mask` is static: when False the per-step output is slots only, so
    nn.scan never has to stack a placeholder (a 0-d placeholder breaks the
    scan out_axes transpose)."""

    slot_attention: nn.Module
    predictor: Optional[nn.Module]
    with_mask: bool = False

    def __call__(self, carry, feat_t):
        prev_slots, pred_carry = carry
        if self.predictor is not None:
            latents, pred_carry = self.predictor(prev_slots, pred_carry)
        else:
            latents = prev_slots
        out = self.slot_attention(feat_t, latents)
        if self.with_mask:
            slots, mask = out
            return (slots, pred_carry), (slots, mask)
        slots = out
        return (slots, pred_carry), (slots,)


class SAVi(nn.Module):
    """Video slot attention autoencoder.

    Config dicts mirror the reference ctor (savi.py:152-199); `clip_len`
    bounds the scan length at inference (static chunking).
    """

    resolution: Tuple[int, int]
    slot_dict: Dict
    enc_dict: Dict
    dec_dict: Dict
    pred_dict: Dict
    loss_dict: Dict
    clip_len: int = 6
    eps: float = 1e-6
    return_mask: bool = False  # SlotAttentionWMask variant for *Diffusion
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
            return_last_attn=self.return_mask,
            dtype=self.dtype)
        self.encoder = SAEncoder(
            resolution=tuple(self.resolution),
            enc_dict=self.enc_dict,
            enc_out_channels=self.enc_dict["enc_out_channels"],
            dtype=self.dtype)
        self.predictor = build_predictor(
            self.pred_dict, self.slot_size,
            rnn_hidden_size=self.slot_dict.get("slot_mlp_size", None),
            dtype=self.dtype)
        if self.dec_dict.get("dec_channels", None):
            self.decoder = SpatialBroadcastDecoder(
                resolution=tuple(self.resolution),
                dec_channels=tuple(self.dec_dict["dec_channels"]),
                dec_resolution=tuple(self.dec_dict["dec_resolution"]),
                dec_ks=self.dec_dict.get("dec_ks", 5),
                dec_norm=self.dec_dict.get("dec_norm", ""),
                dtype=self.dtype)
        else:
            self.decoder = None
        self.step_module = SAViStep(
            slot_attention=self.slot_attention, predictor=self.predictor,
            with_mask=self.return_mask)

    def _pred_zero_carry(self, B):
        if self.predictor is None or not hasattr(self.predictor,
                                                 "_zero_carry"):
            return None
        return self.predictor._zero_carry((B * self.num_slots,))

    def encode(self, img, prev_slots=None):
        """img: [B, T, H, W, 3] -> slots [B, T, N, D] (+ masks [B,T,N,h*w]).

        Matches savi.py:366-397: frame 0 uses the learned init latents
        directly (no predictor) when `prev_slots` is None; later frames (and
        chunk continuations) run the predictor on the previous slots.
        """
        B, T = img.shape[:2]
        feats, self_vis_res = self.encoder(
            img.reshape(B * T, *img.shape[2:]))
        feats = feats.reshape(B, T, *feats.shape[1:])  # [B, T, HW, C]

        scan_mod = nn.scan(
            lambda mod, carry, x: mod(carry, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1)

        if prev_slots is None:
            # frame 0: SA directly from learned init
            init0 = jnp.tile(self.init_latents.astype(self.dtype), (B, 1, 1))
            out0 = self.slot_attention(feats[:, 0], init0)
            if self.return_mask:
                slots0, mask0 = out0
            else:
                slots0, mask0 = out0, None
            carry = (slots0, self._pred_zero_carry(B))
            if T > 1:
                _, ys = scan_mod(self.step_module, carry, feats[:, 1:])
                slots = jnp.concatenate([slots0[:, None], ys[0]], axis=1)
                masks = jnp.concatenate([mask0[:, None], ys[1]], axis=1) \
                    if self.return_mask else None
            else:
                slots = slots0[:, None]
                masks = mask0[:, None] if self.return_mask else None
        else:
            carry = (prev_slots, self._pred_zero_carry(B))
            _, ys = scan_mod(self.step_module, carry, feats)
            slots = ys[0]
            masks = ys[1] if self.return_mask else None
        return (slots, masks, self_vis_res) if self.return_mask \
            else (slots, self_vis_res)

    def decode(self, slots):
        """slots: [BT, N, D] -> (recon, recons, masks)."""
        return self.decoder(slots)

    def __call__(self, data_dict, prev_slots=None, train=True,
                 testing=False):
        img = data_dict["img"]  # [B, T, H, W, 3]
        B, T = img.shape[:2]
        slots, _ = self.encode(img, prev_slots=prev_slots)
        if testing:
            return {"slots": slots}
        recon_img, recons, masks = self.decode(
            slots.reshape(B * T, self.num_slots, self.slot_size))
        unf = lambda x: x.reshape(B, T, *x.shape[1:])
        return {
            "recon_img": unf(recon_img),   # [B, T, H, W, 3]
            "recons": unf(recons),         # [B, T, N, H, W, 3]
            "masks": unf(masks),           # [B, T, N, H, W, 1]
            "slots": slots,                # [B, T, N, D]
        }

    def compute_losses(self, data_dict, sched=None, train=True,
                       testing=False):
        out = self(data_dict, testing=testing)
        if testing:
            # testing forward skips the decoder (returns slots only,
            # reference video_based/models/savi.py loss_function testing
            # path) — there is no reconstruction to score
            return out, {}
        img = data_dict["img"]
        losses = {"img_recon_loss": jnp.mean(
            (out["recon_img"].astype(jnp.float32) -
             img.astype(jnp.float32)) ** 2)}
        return out, losses
