"""SlotFormer — autoregressive slot dynamics for video prediction.

TPU-native rebuild of vp_vqa/models/slotformer.py and ldm_slotformer.py:

- `SlotRollouter` (:46-126): Transformer encoder over the flattened
  (history_len * num_slots) token window with sine temporal PE repeated per
  slot; each rollout step predicts the next frame's slots from the last N
  output tokens and slides the window. The rollout is one `lax.scan` whose
  carry is the token window — `pred_len` steps compile into a single XLA
  while program (vs. a Python loop of full forwards, :112-124).
- `SlotFormer` base (:137-323): rollout + slot MSE with temporal loss-decay
  weighting (RPIN-style, :277-284) and short-video masking (:288-297).
- `LDMSlotFormer` (ldm_slotformer.py:15-215): the decoder is a *frozen*
  checkpoint-loaded slot-conditioned LDM used only for visual decoding;
  training loss is pure slot MSE (:173-185).
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .sa import SpatialBroadcastDecoder
from .slot_diffusion import _build_dm_decoder

Dtype = Any


def sin_pos_enc(seq_len, d_model):
    """Sinusoid PE with *reversed* position order, matching the reference's
    `get_sin_pos_enc` (slotformer.py:8-14, pos_seq counts seq_len-1 .. 0)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0.0, d_model, 2.0) / d_model))
    pos = np.arange(seq_len - 1, -1, -1, dtype=np.float64)
    sinusoid = np.outer(pos, inv_freq)
    pe = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    return jnp.asarray(pe[None], jnp.float32)  # [1, L, D]


class TransformerEncoderLayer(nn.Module):
    """Pre/post-norm transformer encoder layer (torch semantics)."""

    d_model: int
    num_heads: int
    ffn_dim: int
    norm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")
        if self.norm_first:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = x + attn(h, h)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            h = nn.Dense(self.ffn_dim, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype)(h)
            return x + h
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + attn(x, x))
        h = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + h)


class _RolloutStep(nn.Module):
    """One AR step: window [B, T*N, C] -> (new_window, pred [B, N, C]).

    Owned by SlotRollouter and driven by nn.scan with params broadcast —
    the same pattern as SAViStep (calling flax submodules inside a raw
    jax.lax.scan, or nn.scan-ing over `self` from its own method, leaks
    tracers at init)."""

    num_slots: int
    slot_size: int
    d_model: int
    num_layers: int
    num_heads: int
    ffn_dim: int
    norm_first: bool
    dtype: Dtype = jnp.float32

    def setup(self):
        self.in_proj = nn.Dense(self.d_model, dtype=self.dtype)
        self.layers = [
            TransformerEncoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                ffn_dim=self.ffn_dim, norm_first=self.norm_first,
                dtype=self.dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.out_proj = nn.Dense(self.slot_size, dtype=self.dtype)

    def __call__(self, window, pe):
        x = self.in_proj(window) + pe
        for layer in self.layers:
            x = layer(x)
        pred = self.out_proj(x[:, -self.num_slots:])
        new_window = jnp.concatenate(
            [window[:, self.num_slots:], pred], axis=1)
        return new_window, pred


class SlotRollouter(nn.Module):
    """AR rollout over slot tokens (slotformer.py:46-126)."""

    num_slots: int
    slot_size: int
    history_len: int
    t_pe: str = "sin"
    slots_pe: str = ""
    d_model: int = 128
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 512
    norm_first: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.step = _RolloutStep(
            num_slots=self.num_slots, slot_size=self.slot_size,
            d_model=self.d_model, num_layers=self.num_layers,
            num_heads=self.num_heads, ffn_dim=self.ffn_dim,
            norm_first=self.norm_first, dtype=self.dtype, name="step")
        if self.t_pe == "learnable":
            self.enc_t_pe = self.param(
                "enc_t_pe", nn.initializers.zeros,
                (1, self.history_len, self.d_model))
        elif "sin" in self.t_pe:
            self.enc_t_pe = sin_pos_enc(self.history_len, self.d_model)
        else:
            self.enc_t_pe = None
        if self.slots_pe and "sin" in self.slots_pe:
            self.enc_slots_pe = sin_pos_enc(self.num_slots, self.d_model)
        elif self.slots_pe == "learnable":
            self.enc_slots_pe = self.param(
                "enc_slots_pe", nn.initializers.zeros,
                (1, self.num_slots, self.d_model))
        else:
            self.enc_slots_pe = None

    def _pe(self, B):
        # [1, T, D] -> [B, T*N, D], temporal PE repeated per slot
        pe = jnp.repeat(self.enc_t_pe, self.num_slots, axis=1)
        pe = jnp.broadcast_to(pe, (B, *pe.shape[1:]))
        if self.enc_slots_pe is not None:
            spe = jnp.tile(self.enc_slots_pe, (1, self.history_len, 1))
            pe = pe + spe
        return pe.astype(self.dtype)

    def __call__(self, x, pred_len):
        """x: [B, history_len, N, C] -> [B, pred_len, N, C].

        The AR rollout is an `nn.scan` over the step module whose carry is
        the sliding token window; `pred_len` steps compile into one XLA
        while program. The temporal PE is loop-invariant and enters via
        `in_axes=nn.broadcast`."""
        assert x.shape[1] == self.history_len, "wrong burn-in steps"
        B, T, N, C = x.shape
        window = x.reshape(B, T * N, C)
        pe = self._pe(B)

        scan = nn.scan(
            lambda mod, carry, pe: mod(carry, pe),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=nn.broadcast, length=pred_len, out_axes=1)
        _, preds = scan(self.step, window, pe)
        return preds  # [B, pred_len, N, C]


class SlotFormer(nn.Module):
    """Slot dynamics with a SAVi-style spatial-broadcast decoder
    (slotformer.py:137-323). The decoder is frozen (ckpt-loaded) and only
    used when `use_img_recon_loss` or for visualization."""

    resolution: Tuple[int, int]
    clip_len: int
    slot_dict: Dict
    dec_dict: Dict
    rollout_dict: Dict
    loss_dict: Dict
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    def setup(self):
        self.num_slots = self.slot_dict["num_slots"]
        self.slot_size = self.slot_dict["slot_size"]
        rd = dict(self.rollout_dict)
        self.history_len = rd["history_len"]
        self.rollouter = SlotRollouter(
            num_slots=rd.get("num_slots", self.num_slots),
            slot_size=rd.get("slot_size", self.slot_size),
            history_len=rd["history_len"],
            t_pe=rd.get("t_pe", "sin"),
            slots_pe=rd.get("slots_pe", ""),
            d_model=rd.get("d_model", 128),
            num_layers=rd.get("num_layers", 4),
            num_heads=rd.get("num_heads", 8),
            ffn_dim=rd.get("ffn_dim", 512),
            norm_first=rd.get("norm_first", True),
            dtype=self.dtype,
            name="rollouter")
        self.rollout_len = self.loss_dict["rollout_len"]
        self.use_img_recon_loss = self.loss_dict.get(
            "use_img_recon_loss", False)
        self._build_decoder()

    def _build_decoder(self):
        if self.dec_dict.get("dec_channels", None):
            self.decoder = SpatialBroadcastDecoder(
                resolution=tuple(self.resolution),
                dec_channels=tuple(self.dec_dict["dec_channels"]),
                dec_resolution=tuple(self.dec_dict["dec_resolution"]),
                dec_ks=self.dec_dict.get("dec_ks", 5),
                dec_norm=self.dec_dict.get("dec_norm", ""),
                dtype=self.dtype,
                name="decoder")
        else:
            self.decoder = None

    def decode(self, slots):
        """slots [B', N, C] -> (recon, recons, masks); frozen decoder."""
        return jax.tree_util.tree_map(
            jax.lax.stop_gradient, self.decoder(slots))

    def rollout(self, past_slots, pred_len, decode=False, with_gt=True):
        """Unroll `pred_len` future slot sets (slotformer.py:216-241)."""
        B = past_slots.shape[0]
        pred_slots = self.rollouter(
            past_slots[:, -self.history_len:], pred_len)
        if not decode:
            return pred_slots
        slots = jnp.concatenate([past_slots, pred_slots], axis=1) \
            if with_gt else pred_slots
        T = slots.shape[1]
        recon, recons, masks = self.decode(
            slots.reshape(B * T, self.num_slots, self.slot_size))
        unf = lambda x: x.reshape(B, T, *x.shape[1:])
        return {
            "recon_combined": unf(recon),
            "recons": unf(recons),
            "masks": unf(masks),
            "slots": slots,
        }

    def __call__(self, data_dict, train=True):
        slots = data_dict["slots"]  # [B, T, N, C]
        assert slots.shape[1] == self.history_len + self.rollout_len, \
            "wrong SlotFormer training length"
        past_slots = slots[:, :self.history_len]
        gt_slots = slots[:, self.history_len:]
        if self.use_img_recon_loss:
            out = self.rollout(past_slots, self.rollout_len, decode=True,
                               with_gt=False)
            out["pred_slots"] = out.pop("slots")
            out["gt_slots"] = gt_slots
        else:
            out = {
                "pred_slots": self.rollout(past_slots, self.rollout_len),
                "gt_slots": gt_slots,
            }
            if self.is_initializing() and self.decoder is not None:
                # decoder is sampling/viz-only when img-recon loss is off;
                # give it params at init so ckpt grafting / eval apply work
                self.decode(out["pred_slots"].reshape(
                    -1, self.num_slots, self.slot_size))
        return out

    def compute_losses(self, data_dict, sched=None, train=True):
        """Slot MSE with loss decay + short-video masking
        (slotformer.py:264-308). `sched['loss_decay_factor']` is annealed by
        the method layer (vp_vqa/method.py:188-210)."""
        out = self(data_dict, train=train)
        gt = out["gt_slots"].astype(jnp.float32)
        pred = out["pred_slots"].astype(jnp.float32)
        per_elem = (pred - gt) ** 2  # [B, rT, N, C]
        rT = gt.shape[1]

        losses = {}
        if not train:
            for step in range(min(6, rT)):
                losses[f"slot_recon_loss_{step + 1}"] = \
                    per_elem[:, step].mean()

        decay = 1.0
        if sched is not None and "loss_decay_factor" in sched:
            decay = sched["loss_decay_factor"]
        w = decay ** jnp.arange(rT, dtype=jnp.float32)
        w = w / jnp.sum(w) * rT
        weighted = per_elem * w[None, :, None, None]

        vid_len = data_dict.get("vid_len", None)
        if vid_len is not None:
            valid = (jnp.arange(rT)[None] + self.history_len) < \
                vid_len[:, None]  # [B, rT]
            vmask = valid[:, :, None, None].astype(jnp.float32)
            losses["slot_recon_loss"] = \
                jnp.sum(weighted * vmask) / jnp.maximum(
                    jnp.sum(vmask) * gt.shape[2] * gt.shape[3], 1.0)
        else:
            losses["slot_recon_loss"] = weighted.mean()

        if self.use_img_recon_loss:
            gt_img = data_dict["img"][:, self.history_len:]
            img_loss = (out["recon_combined"].astype(jnp.float32) -
                        gt_img.astype(jnp.float32)) ** 2
            if vid_len is not None:
                vmask = valid[:, :, None, None, None].astype(jnp.float32)
                losses["img_recon_loss"] = jnp.sum(img_loss * vmask) / \
                    jnp.maximum(jnp.sum(vmask) * np.prod(img_loss.shape[2:]),
                                1.0)
            else:
                losses["img_recon_loss"] = img_loss.mean()
        return out, losses


class LDMSlotFormer(SlotFormer):
    """SlotFormer with a frozen slot-conditioned LDM decoder
    (ldm_slotformer.py:15-215). Training uses pure slot MSE; the LDM only
    decodes rollouts for visualization/VP metrics via DPM-Solver."""

    @property
    def use_ema(self):
        return False

    def _build_decoder(self):
        self.decoder = None
        self.dm_decoder = _build_dm_decoder(self.dec_dict, self.dtype)

    def __call__(self, data_dict, train=True):
        out = super().__call__(data_dict, train=train)
        if self.is_initializing():
            # the frozen LDM decoder never runs in the slot-MSE loss; give
            # it params at init so `dm_ckp_path` grafting and decode work
            B = out["pred_slots"].shape[0]
            dummy = jnp.zeros((B, *self.resolution, 3), jnp.float32)
            self.dm_decoder.loss_function(
                dummy, context=out["pred_slots"][:, 0], train=False)
        return out

    def decode(self, slots, rng=None, use_dpm=True, same_noise=True):
        """slots [B', N, C] -> decoded frames via the frozen LDM
        (ldm_slotformer.py:193-215)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        from .diffusion import LDM
        samples = self.dm_decoder.generate_imgs(
            rng, cond=slots, use_dpm=use_dpm, same_noise=same_noise)
        if isinstance(self.dm_decoder, LDM):
            samples = self.dm_decoder.decode_latent(samples)
        return jax.lax.stop_gradient(samples)

    def rollout(self, past_slots, pred_len, decode=False, with_gt=True,
                rng=None):
        B = past_slots.shape[0]
        pred_slots = self.rollouter(
            past_slots[:, -self.history_len:], pred_len)
        if not decode:
            return pred_slots
        slots = jnp.concatenate([past_slots, pred_slots], axis=1) \
            if with_gt else pred_slots
        T = slots.shape[1]
        frames = self.decode(
            slots.reshape(B * T, self.num_slots, self.slot_size), rng=rng)
        return {
            "recon_combined": frames.reshape(B, T, *frames.shape[1:]),
            "slots": slots,
        }
