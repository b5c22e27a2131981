"""SA — Slot Attention image model.

TPU-native rebuild of the reference `SA` (img_based/models/slot_attention.py:
115-425): encoder (CNN / GN-ResNet / frozen DINO) + SoftPositionEmbed + MLP
head -> Slot Attention with learnable init slot embeddings -> spatial
broadcast deconv decoder producing RGB+alpha per slot, softmax over slots,
alpha-weighted sum reconstruction. MSE reconstruction loss.

Differences from the reference are layout-only (NHWC) and framework-idiomatic
(explicit apply, dict outputs). `testing=True` short-circuits after encoding
for slot extraction, matching reference :329-330.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvNormAct, DeconvNormAct, SoftPositionEmbed, build_grid
from .resnet import resnet18, resnet34
from .slot_attention import SlotAttention

Dtype = Any


class SAEncoder(nn.Module):
    """Image -> flattened per-pixel features [B, H*W, C_out].

    Mirrors reference `_build_encoder` + `_get_encoder_out`
    (slot_attention.py:182-245, 294-304): backbone -> SoftPositionEmbed ->
    flatten -> LN -> 2-layer MLP head.
    """

    resolution: Tuple[int, int]
    enc_dict: Dict
    enc_out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        # img: [B, H, W, 3]
        enc = dict(self.enc_dict)
        if enc.get("resnet", False):
            use_layer4 = enc.get("use_layer4", False)
            backbone = {"resnet18": resnet18, "resnet34": resnet34}[
                enc["resnet"]](
                    small_inputs=True,
                    use_layer4=use_layer4,
                    replace_stride_with_dilation=tuple(
                        enc.get("replace_stride_with_dilation",
                                (False, False, False))),
                    dtype=self.dtype)
            x = backbone(img)
            visual_resolution = (x.shape[1], x.shape[2])
        elif enc.get("dino", False):
            from .dino import DINOEncoder
            x = DINOEncoder(
                patch_size=enc["patch_size"],
                small_size=enc.get("small_size", True),
                dtype=self.dtype)(img)
            visual_resolution = (x.shape[1], x.shape[2])
        else:
            # plain CNN: 2x downsample for >64px inputs (reference :213-235)
            downsample = self.resolution[0] > 64
            enc_channels = list(enc["enc_channels"])[1:]  # drop in_ch entry
            n_layers = len(enc_channels)
            x = img
            for i, ch in enumerate(enc_channels):
                x = ConvNormAct(
                    out_channels=ch,
                    kernel_size=enc.get("enc_ks", 5),
                    stride=2 if (i == 0 and downsample) else 1,
                    norm=enc.get("enc_norm", ""),
                    act="relu" if i != n_layers - 1 else "",
                    dtype=self.dtype)(x)
            visual_resolution = (x.shape[1], x.shape[2])

        x = SoftPositionEmbed(
            hidden_size=x.shape[-1], resolution=visual_resolution,
            dtype=self.dtype)(x)
        B, h, w, c = x.shape
        x = x.reshape(B, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.enc_out_channels, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.enc_out_channels, dtype=self.dtype)(x)
        return x, visual_resolution


class SpatialBroadcastDecoder(nn.Module):
    """Slots -> per-slot RGB + alpha via spatial broadcast.

    Mirrors reference `_build_decoder` + `decode` (slot_attention.py:247-287,
    343-364): broadcast each slot over a small grid, add position embedding,
    upsample with stride-2 deconvs until reaching `resolution` (then stride
    1), final 1x1 conv to 4 channels.
    """

    resolution: Tuple[int, int]
    dec_channels: Tuple[int, ...]
    dec_resolution: Tuple[int, int]
    dec_ks: int = 5
    dec_norm: str = ""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, slots):
        # slots: [B, S, D]
        B, S, D = slots.shape
        H, W = self.resolution
        h0, w0 = self.dec_resolution
        x = slots.reshape(B * S, 1, 1, D)
        x = jnp.tile(x, (1, h0, w0, 1))
        x = SoftPositionEmbed(
            hidden_size=D, resolution=self.dec_resolution,
            dtype=self.dtype)(x)
        out_size = (h0, w0)
        for ch in self.dec_channels[1:]:
            stride = 1 if out_size == self.resolution else 2
            x = DeconvNormAct(
                out_channels=ch, kernel_size=self.dec_ks, stride=stride,
                norm=self.dec_norm, act="relu", dtype=self.dtype)(x)
            out_size = (out_size[0] * stride, out_size[1] * stride)
        assert out_size == tuple(self.resolution), (
            f"decoder output {out_size} != resolution {self.resolution}; "
            "adjust dec_resolution/dec_channels")
        x = nn.Conv(4, (1, 1), dtype=self.dtype)(x)  # RGB + alpha logit
        x = x.reshape(B, S, H, W, 4)
        recons = x[..., :3]  # [B, S, H, W, 3]
        mask_logits = x[..., 3:]  # [B, S, H, W, 1]
        masks = jax.nn.softmax(mask_logits, axis=1)
        recon_img = jnp.sum(recons * masks, axis=1)  # [B, H, W, 3]
        return recon_img, recons, masks


class SA(nn.Module):
    """Slot Attention autoencoder on images."""

    resolution: Tuple[int, int]
    slot_dict: Dict
    enc_dict: Dict
    dec_dict: Dict
    loss_dict: Dict
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    def setup(self):
        sd = self.slot_dict
        self.num_slots = sd["num_slots"]
        self.slot_size = sd["slot_size"]
        # learnable per-slot init embeddings (reference :170-171)
        self.init_latents = self.param(
            "init_latents", nn.initializers.normal(1.0),
            (1, self.num_slots, self.slot_size))
        self.slot_attention = SlotAttention(
            num_iterations=sd["num_iterations"],
            slot_size=self.slot_size,
            mlp_hidden_size=sd["slot_mlp_size"],
            eps=self.eps,
            return_last_attn=False,
            dtype=self.dtype)
        self.encoder = SAEncoder(
            resolution=tuple(self.resolution),
            enc_dict=self.enc_dict,
            enc_out_channels=self.enc_dict["enc_out_channels"],
            dtype=self.dtype)
        self.decoder = SpatialBroadcastDecoder(
            resolution=tuple(self.resolution),
            dec_channels=tuple(self.dec_dict["dec_channels"]),
            dec_resolution=tuple(self.dec_dict["dec_resolution"]),
            dec_ks=self.dec_dict.get("dec_ks", 5),
            dec_norm=self.dec_dict.get("dec_norm", ""),
            dtype=self.dtype)

    def encode(self, img, init_slots=None):
        feats, _ = self.encoder(img)
        if init_slots is None:
            init_slots = jnp.tile(
                self.init_latents.astype(self.dtype), (img.shape[0], 1, 1))
        return self.slot_attention(feats, init_slots)

    def decode(self, slots):
        return self.decoder(slots)

    def __call__(self, data_dict, train=True, testing=False):
        img = data_dict["img"]  # [B, H, W, 3]
        slots = self.encode(img)
        if testing:
            return {"slots": slots}
        recon_img, recons, masks, = self.decode(slots)
        return {
            "recon_img": recon_img,
            "recons": recons,
            "masks": masks,
            "slots": slots,
        }

    @staticmethod
    def calc_train_loss(data_dict, out_dict):
        """MSE reconstruction loss (reference :366-373)."""
        recon = out_dict["recon_img"]
        img = data_dict["img"]
        return {"img_recon_loss": jnp.mean(
            (recon.astype(jnp.float32) - img.astype(jnp.float32)) ** 2)}

    def compute_losses(self, data_dict, sched=None, train=True,
                       testing=False):
        """Trainer protocol: (out_dict, loss_dict)."""
        out = self(data_dict, testing=testing)
        return out, self.calc_train_loss(data_dict, out)
