"""dVAE — discrete VAE tokenizer for SLATE/STEVE.

TPU-native rebuild of the reference dVAE (video_based/models/steve/dVAE.py,
img twin slate/dVAE.py): stride-4 conv encoder to `vocab_size` logits,
gumbel-softmax sampling with annealed temperature (tau annealing handled by
the trainer's step_scalars, video_based/method.py:549-567), decoder with two
PixelShuffle(2) upsampling stages, MSE reconstruction loss.

NHWC; PixelShuffle implemented as reshape-transpose (depth-to-space), which
XLA lowers to a pure layout change.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import gumbel_softmax
from .vqvae import _temporal_flatten, _temporal_unflatten

Dtype = Any


def pixel_shuffle(x, r=2):
    """Depth-to-space: [B, H, W, C*r*r] -> [B, H*r, W*r, C].

    Channel packing follows torch nn.PixelShuffle: the input channel index
    decomposes as (c_out, r_row, r_col) — so torch-trained conv weights
    feeding a PixelShuffle convert without permutation."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c)


class Conv2dBlock(nn.Module):
    """Bias-free conv -> GroupNorm(1 group) -> ReLU (steve_utils.py:95-119:
    `F.group_norm(x, 1, ...)` over a bias-less kaiming conv).

    Padding follows the reference call sites (dVAE.py:25-50): k=stride
    patchify convs use padding 0, k=3 s=1 uses symmetric padding 1, k=1
    needs none — all representable as torch-style symmetric padding k//2
    except the patchify case.
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kernel_size == self.stride:
            pad = ((0, 0), (0, 0))  # torch padding=0 patchify
        else:
            p = self.kernel_size // 2
            pad = ((p, p), (p, p))  # torch symmetric padding=k//2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad, use_bias=False,
            dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(
                             x.astype(jnp.float32)).astype(x.dtype)
        return nn.relu(x)


class DVAE(nn.Module):
    """Discrete VAE; `vocab_size` matches the reference ctor (dVAE.py:11)."""

    vocab_size: int
    img_channels: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc_blocks = [
            Conv2dBlock(64, 4, 4, dtype=self.dtype),  # stride-4 tokenizer
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
        ]
        self.enc_out = nn.Conv(self.vocab_size, (1, 1), dtype=jnp.float32)
        self.dec_blocks1 = [
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 3, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(256, 1, 1, dtype=self.dtype),
        ]
        self.dec_blocks2 = [
            Conv2dBlock(64, 3, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(64, 1, 1, dtype=self.dtype),
            Conv2dBlock(256, 1, 1, dtype=self.dtype),
        ]
        self.dec_out = nn.Conv(self.img_channels, (1, 1), dtype=jnp.float32)

    def encode_logits(self, imgs):
        """[B(,T), H, W, C] -> [B(,T), h, w, vocab] token logits."""
        x, bt = _temporal_flatten(imgs)
        for blk in self.enc_blocks:
            x = blk(x)
        return _temporal_unflatten(self.enc_out(x), bt)

    def tokenize(self, imgs, one_hot=True):
        """Hard tokens: one-hot [.., h, w, vocab] or indices [.., h, w]
        (dVAE.py:52-79)."""
        logits = self.encode_logits(imgs)
        idx = jnp.argmax(logits, axis=-1)
        if one_hot:
            return jax.nn.one_hot(idx, self.vocab_size, dtype=logits.dtype)
        return idx

    def detokenize(self, z):
        """z: [.., h, w, vocab] probabilities -> reconstructed image."""
        x, bt = _temporal_flatten(z)
        for blk in self.dec_blocks1:
            x = blk(x)
        x = pixel_shuffle(x, 2)
        for blk in self.dec_blocks2:
            x = blk(x)
        x = pixel_shuffle(x, 2)
        return _temporal_unflatten(self.dec_out(x), bt)

    def __call__(self, data_dict, sched=None, train=True, testing=False):
        """Gumbel-softmax forward (dVAE.py:101-140); tau comes from the
        trainer's annealed `sched['gumbel_tau']`."""
        img = data_dict["img"]
        if testing:
            return {"token_id": self.tokenize(img, one_hot=False)}
        tau = 1.0
        if sched is not None and "gumbel_tau" in sched:
            tau = sched["gumbel_tau"]
        hard = bool(data_dict.get("hard", False))
        logits = self.encode_logits(img)
        z_logits = jax.nn.log_softmax(logits, axis=-1)
        if train:
            rng = self.make_rng("gumbel")
            z = gumbel_softmax(rng, z_logits, tau=tau, hard=hard, axis=-1)
        else:
            z = jax.nn.softmax(z_logits / tau, axis=-1)
        recon = self.detokenize(z)
        return {"recon": recon, "z_logits": z_logits}

    def compute_losses(self, data_dict, sched=None, train=True):
        out = self(data_dict, sched=sched, train=train)
        img = data_dict["img"]
        loss = {"recon_loss": jnp.mean(
            (out["recon"].astype(jnp.float32) -
             img.astype(jnp.float32)) ** 2)}
        return out, loss
