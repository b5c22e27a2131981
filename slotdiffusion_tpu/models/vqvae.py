"""VQ-VAE: taming-transformers-style encoder/decoder + vector quantizer.

TPU-native rebuild of the reference stack
(video_based/models/vqvae/{modules,quantize,VQVAE,loss}.py):

- Encoder/Decoder: ResNet blocks + optional mid attention, downsampling by
  len(ch_mult)-1 (modules.py:168-362); NHWC, bf16-friendly
- VectorQuantizer: L2 nearest-neighbor codebook lookup formulated as one
  distance matmul hitting the MXU (quantize.py:87-93), commitment loss with
  the legacy beta placement (quantize.py:98-104), straight-through estimator
  (:107), codebook init U(-1/n, 1/n) (:36-37)
- VQVAE: `encode / encode_quantize / quantize_decode / decode` API and the
  temporal wrapper semantics — every method accepts [B, H, W, C] or
  [B, T, H, W, C] by flattening T into B (VQVAE.py:14-37)
- VQVAEWrapper: frozen, z-scaled view used as the LDM first stage
  (VQVAE.py:155-194); freezing is enforced by the caller via stop_gradient
- Training loss: L1 recon + perceptual (LPIPS) + quant loss dict
  (loss.py:8-46); the perceptual term uses ops/lpips.py and is disabled when
  no pretrained VGG weights are available
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import GroupNorm32

Dtype = Any


def _temporal_flatten(x):
    """[B, T, H, W, C] -> ([B*T, H, W, C], T) or passthrough."""
    if x.ndim == 5:
        B, T = x.shape[:2]
        return x.reshape(B * T, *x.shape[2:]), (B, T)
    return x, None


def _temporal_unflatten(x, bt):
    if bt is None:
        return x
    B, T = bt
    return x.reshape(B, T, *x.shape[1:])


# GroupNorm eps: the reference's Normalize() builds GroupNorm(eps=1e-6)
# throughout the VQ-VAE (modules.py:12-14)
_GN_EPS = 1e-6


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        h = GroupNorm32(epsilon=_GN_EPS, dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        h = GroupNorm32(epsilon=_GN_EPS, dtype=self.dtype)(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over pixels (modules.py:113-165)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(epsilon=_GN_EPS, dtype=self.dtype)(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype)(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype)(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype)(h).reshape(B, H * W, C)
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) * (C ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H, W, C).astype(self.dtype)
        out = nn.Conv(C, (1, 1), dtype=self.dtype)(out)
        return x + out


class Encoder(nn.Module):
    """conv_in -> [res x num_res_blocks, downsample] per ch_mult level ->
    mid(res, attn?, res) -> GN/silu -> conv_out(2*z or z channels)."""

    ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    z_channels: int
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 128
    dropout: float = 0.0
    double_z: bool = False
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        attn = self.attn_type == "vanilla"
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        cur_res = self.resolution
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, self.dropout,
                                dtype=self.dtype,
                                name=f"down{level}_res{i}")(h, train)
                if attn and cur_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"down{level}_attn{i}")(h)
            if level != len(self.ch_mult) - 1:
                # asymmetric-pad stride-2 conv downsample (modules.py:84-99)
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"down{level}_ds")(h)
                cur_res //= 2
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype,
                        name="mid_res1")(h, train)
        # the reference builds mid attention unconditionally (make_attn with
        # default attn_type='vanilla', modules.py:228-233) — even when
        # attn_resolutions is empty, as in every shipped config
        if attn:
            h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype,
                        name="mid_res2")(h, train)
        h = GroupNorm32(epsilon=_GN_EPS, dtype=self.dtype,
                        name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), dtype=jnp.float32,
                       name="conv_out")(h)


class Decoder(nn.Module):
    ch: int
    ch_mult: Tuple[int, ...]
    num_res_blocks: int
    out_ch: int
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 128
    dropout: float = 0.0
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train=False):
        attn = self.attn_type == "vanilla"
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, self.dropout, dtype=self.dtype,
                        name="mid_res1")(h, train)
        if attn:  # unconditional in the reference (see Encoder note)
            h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(block_in, self.dropout, dtype=self.dtype,
                        name="mid_res2")(h, train)
        cur_res = self.resolution // (2 ** (len(self.ch_mult) - 1))
        for level in reversed(range(len(self.ch_mult))):
            ch = self.ch * self.ch_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = ResnetBlock(ch, self.dropout, dtype=self.dtype,
                                name=f"up{level}_res{i}")(h, train)
                if attn and cur_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"up{level}_attn{i}")(h)
            if level != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C),
                                     method="nearest")
                h = nn.Conv(C, (3, 3), dtype=self.dtype,
                            name=f"up{level}_us")(h)
                cur_res *= 2
        h = GroupNorm32(epsilon=_GN_EPS, dtype=self.dtype,
                        name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), dtype=jnp.float32,
                       name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """L2 nearest-neighbor quantizer with straight-through gradients.

    XLA-friendly formulation of quantize.py:80-123: |z|^2 + |e|^2 - 2 z e^T
    computed as one [P, n_e] matmul, argmin, gather. Commitment loss uses the
    legacy beta placement (beta on the (z_q - sg(z)) term, quantize.py:99-104).
    """

    n_e: int
    e_dim: int
    beta: float = 0.25
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.n_e, 1.0 / self.n_e),
            (self.n_e, self.e_dim))

    def nearest_indices(self, z_flat):
        """z_flat: [P, e_dim] -> [P] int32 codebook indices."""
        e = self.embedding
        # distance argmin == argmax(2 z e^T - |e|^2); |z|^2 is constant in e
        scores = 2.0 * jnp.einsum(
            "pd,nd->pn", z_flat, e, preferred_element_type=jnp.float32) \
            - jnp.sum(e.astype(jnp.float32) ** 2, axis=-1)[None]
        return jnp.argmax(scores, axis=-1)

    def __call__(self, z):
        """z: [B, h, w, e_dim] -> (z_q, loss, indices [B, h, w])."""
        shp = z.shape
        z_flat = z.reshape(-1, self.e_dim).astype(jnp.float32)
        idx = self.nearest_indices(z_flat)
        z_q = jnp.take(self.embedding, idx, axis=0).reshape(shp)
        zf = z.astype(jnp.float32)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2) + \
            self.beta * jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2)
        # straight-through estimator (quantize.py:107)
        z_q = zf + jax.lax.stop_gradient(z_q - zf)
        return z_q.astype(z.dtype), loss, idx.reshape(shp[:-1])

    def quantize_only(self, z):
        """Value-only quantization used as the LDM `vq_denoised` correction."""
        shp = z.shape
        idx = self.nearest_indices(z.reshape(-1, self.e_dim)
                                   .astype(jnp.float32))
        return jnp.take(self.embedding, idx, axis=0).reshape(shp) \
            .astype(z.dtype)

    def codebook_entry(self, indices):
        """indices [...]-> embeddings [..., e_dim] (quantize.py:125-140)."""
        return jnp.take(self.embedding, indices, axis=0)


class VQVAE(nn.Module):
    """Full VQ-VAE with the reference's API (VQVAE.py:40-152). All methods
    accept images or videos (temporal dim folded into batch)."""

    enc_dec_dict: Dict
    vq_dict: Dict
    dtype: Dtype = jnp.float32

    def setup(self):
        ed = self.enc_dec_dict
        self.resolution = ed["resolution"]
        self.z_channels = ed["z_channels"]
        self.encoder = Encoder(
            ch=ed["ch"], ch_mult=tuple(ed["ch_mult"]),
            num_res_blocks=ed["num_res_blocks"],
            z_channels=ed["z_channels"],
            attn_resolutions=tuple(ed.get("attn_resolutions", ())),
            resolution=ed["resolution"], dropout=ed.get("dropout", 0.0),
            attn_type=ed.get("attn_type", "vanilla"), dtype=self.dtype)
        self.decoder = Decoder(
            ch=ed["ch"], ch_mult=tuple(ed["ch_mult"]),
            num_res_blocks=ed["num_res_blocks"], out_ch=ed["out_ch"],
            attn_resolutions=tuple(ed.get("attn_resolutions", ())),
            resolution=ed["resolution"], dropout=ed.get("dropout", 0.0),
            attn_type=ed.get("attn_type", "vanilla"), dtype=self.dtype)
        self.quantize = VectorQuantizer(
            n_e=self.vq_dict["n_embed"], e_dim=self.vq_dict["embed_dim"],
            beta=self.vq_dict.get("beta", 0.25), dtype=self.dtype)
        self.quant_conv = nn.Conv(self.vq_dict["embed_dim"], (1, 1),
                                  dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(ed["z_channels"], (1, 1),
                                       dtype=jnp.float32)

    def encode(self, x, train=False):
        """Image -> continuous latent (pre-quantization)."""
        x, bt = _temporal_flatten(x)
        h = self.encoder(x, train)
        h = self.quant_conv(h)
        return _temporal_unflatten(h, bt)

    def encode_quantize(self, x, train=False):
        h, bt = _temporal_flatten(self.encode(x, train))
        z_q, loss, idx = self.quantize(h)
        return (_temporal_unflatten(z_q, bt), loss,
                _temporal_unflatten(idx, bt))

    def quantize_decode(self, h, train=False):
        h, bt = _temporal_flatten(h)
        z_q, _, _ = self.quantize(h)
        x = self.decoder(self.post_quant_conv(z_q), train)
        return _temporal_unflatten(x, bt)

    def decode(self, z_q, train=False):
        z_q, bt = _temporal_flatten(z_q)
        x = self.decoder(self.post_quant_conv(z_q), train)
        return _temporal_unflatten(x, bt)

    def __call__(self, data_dict, train=False):
        x = data_dict["img"]
        z_q, quant_loss, token_id = self.encode_quantize(x, train)
        recon = self.decode(z_q, train)
        return {
            "recon": recon,
            "quant_loss": quant_loss,
            "token_id": token_id,
            "z_q": z_q,
        }

    def compute_losses(self, data_dict, sched=None, train=True):
        """L1 recon + quant loss (+ LPIPS perceptual when VGG weights are
        available), the VQLPIPSLoss dict (reference vqvae/loss.py:8-46)."""
        out = self(data_dict, train=train)
        img = data_dict["img"]
        losses = {
            "recon_loss": jnp.mean(jnp.abs(
                out["recon"].astype(jnp.float32) -
                img.astype(jnp.float32))),
            "quant_loss": out["quant_loss"],
        }
        if self.vq_dict.get("percept_loss_w", 0.0):
            from ..ops.lpips import lpips_available, lpips_distance
            if lpips_available():
                # video inputs: LPIPS is per-frame, fold T into batch
                rec, _ = _temporal_flatten(out["recon"])
                gt, _ = _temporal_flatten(img)
                losses["percept_loss"] = lpips_distance(rec, gt).mean()
        return out, losses


class VQVAEWrapper(nn.Module):
    """Frozen z-scaled first stage for the LDM (VQVAE.py:155-194).

    Encoded latents are DIVIDED by `scale_factor` (VQVAE.py:184 —
    `z_scale_factor` is calibrated to the latent std, so dividing
    normalizes the diffusion space to unit-ish variance) and multiplied
    back before decode/quantize. Every published config ships
    z_scale_factor=1.0, but the direction matters for parity with
    reference checkpoints trained at other values."""

    enc_dec_dict: Dict
    vq_dict: Dict
    scale_factor: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.vqvae = VQVAE(enc_dec_dict=self.enc_dec_dict,
                           vq_dict=self.vq_dict, dtype=self.dtype)

    def encode(self, x):
        return self.vqvae.encode(x) / self.scale_factor

    def decode(self, z, quantize=True):
        """Decode latents; `quantize=True` (the reference default,
        VQVAE.py:186-190) snaps to the nearest codebook entries first —
        DPM/DDIM-sampled latents are unquantized continuous values, so
        skipping the snap decodes off-manifold latents."""
        if quantize:
            return self.vqvae.quantize_decode(z * self.scale_factor)
        return self.vqvae.decode(z * self.scale_factor)

    def quantize(self, z):
        """Quantize scaled latents (used as vq_denoised correction +
        quantize_decode path); VQVAE.py:192-194."""
        z = z * self.scale_factor
        z, bt = _temporal_flatten(z)
        z_q = self.vqvae.quantize.quantize_only(z)
        return _temporal_unflatten(z_q, bt) / self.scale_factor

    def quantize_decode(self, z):
        return self.vqvae.quantize_decode(z * self.scale_factor)

    def __call__(self, x):
        """Init helper: run encode+quantize+decode to create all params."""
        z = self.encode(x)
        zq = self.quantize(z)
        return self.decode(zq)
