"""Denoising UNet with slot cross-attention (LDM-style).

TPU-native rebuild of the reference's UNetModel + SpatialTransformer stack
(video_based/models/unet/unet.py:344-584, unet/attention.py:157-308):

- ResBlocks with timestep-embedding FiLM-add (unet.py:261-285)
- `SpatialTransformer` at downsample factors listed in
  `attention_resolutions`: pre-norm blocks of self-attention ->
  cross-attention over slots -> GEGLU FFN (attention.py:209-251)
- middle block ResBlock/Transformer/ResBlock, skip-concat decoder,
  zero-initialized output conv (unet.py:466-543)

TPU adaptations: NHWC layout, attention as batched einsums hitting the MXU
with fp32 accumulation, optional `nn.remat` in place of the reference's
custom checkpoint autograd function (unet/utils.py:16-67), bf16 compute with
fp32 GroupNorm statistics.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import GroupNorm32, timestep_embedding

Dtype = Any

zero_init = nn.initializers.zeros


def _attention(q, k, v, num_heads, dtype, backend="einsum"):
    """Multi-head attention over token dims.

    q: [B, Nq, H*D], k/v: [B, Nk, H*D] -> [B, Nq, H*D].

    Two implementations selected by `backend` (a model-config knob,
    `unet_dict['attn_backend']`, default einsum): in-context A/B at the
    flagship UNet scale measured the einsum+softmax chain at ~195-199
    steps/s vs ~191 for jax.nn.dot_product_attention (the DPA win in
    isolated micro-benchmarks does not survive fusion context).
    Logits and softmax stay f32 end-to-end — matching the reference's
    fp32 QKVAttention (unet.py:334) — and only the softmax weights are
    cast to the compute dtype for the value matmul.
    """
    B, Nq, HD = q.shape
    Nk = k.shape[1]
    D = HD // num_heads
    q = q.reshape(B, Nq, num_heads, D)
    k = k.reshape(B, Nk, num_heads, D)
    v = v.reshape(B, Nk, num_heads, D)
    if backend == "einsum":
        scale = D ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                         preferred_element_type=jnp.float32)
        return out.astype(dtype).reshape(B, Nq, HD)
    out = jax.nn.dot_product_attention(q, k, v)
    return out.astype(dtype).reshape(B, Nq, HD)


class CrossAttention(nn.Module):
    """Q from x, K/V from context (or x when context is None).

    Mirrors reference attention.py:157-206: no-bias q/k/v projections,
    output projection with bias. (A fused-QKV variant was measured and
    reverted: the post-matmul split copies cancel the larger-matmul win.)
    """

    query_dim: int
    context_dim: Optional[int] = None
    num_heads: int = 8
    head_dim: int = 64
    attn_backend: str = "einsum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = _attention(q, k, v, self.num_heads, self.dtype,
                         backend=self.attn_backend)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 2, dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class TransformerBlock(nn.Module):
    """Pre-norm: self-attn -> cross-attn(context) -> GEGLU FFN, all residual
    (reference attention.py:209-251)."""

    dim: int
    num_heads: int
    head_dim: int
    context_dim: Optional[int] = None
    attn_backend: str = "einsum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(
            query_dim=self.dim, context_dim=None,
            num_heads=self.num_heads, head_dim=self.head_dim,
            attn_backend=self.attn_backend,
            dtype=self.dtype, name="attn1")(
                nn.LayerNorm(dtype=self.dtype)(x))
        x = x + CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            num_heads=self.num_heads, head_dim=self.head_dim,
            attn_backend=self.attn_backend,
            dtype=self.dtype, name="attn2")(
                nn.LayerNorm(dtype=self.dtype)(x), context=context)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = GEGLU(self.dim * 4, dtype=self.dtype)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj -> transformer blocks over flattened pixels ->
    zero-init 1x1 proj, residual (reference attention.py:254-308)."""

    channels: int
    num_heads: int
    head_dim: int
    depth: int = 1
    context_dim: Optional[int] = None
    attn_backend: str = "einsum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        h = GroupNorm32(dtype=self.dtype)(x)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(h)
        h = h.reshape(B, H * W, self.channels)
        for i in range(self.depth):
            h = TransformerBlock(
                dim=self.channels, num_heads=self.num_heads,
                head_dim=self.head_dim, context_dim=self.context_dim,
                attn_backend=self.attn_backend,
                dtype=self.dtype, name=f"block{i}")(h, context=context)
        h = h.reshape(B, H, W, self.channels)
        h = nn.Conv(self.channels, (1, 1), kernel_init=zero_init,
                    dtype=self.dtype)(h)
        return x + h


class ResBlock(nn.Module):
    """GN -> SiLU -> conv, +time-emb FiLM-add, GN -> SiLU -> zero-init conv,
    residual with 1x1 skip on channel change (reference unet.py:182-285).
    Optional fused up/downsampling applied to both paths."""

    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train=False):
        h = GroupNorm32(dtype=self.dtype)(x)
        h = nn.silu(h)
        if self.up:
            h = _upsample2x(h)
            x = _upsample2x(x)
        elif self.down:
            h = _avgpool2x(h)
            x = _avgpool2x(x)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype)(
            nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm32(dtype=self.dtype)(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=zero_init,
                    dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


def _upsample2x(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


def _avgpool2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Downsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           dtype=self.dtype)(x)
        return _avgpool2x(x)


class Upsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _upsample2x(x)
        if self.use_conv:
            x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(x)
        return x


class UNetModel(nn.Module):
    """Full denoising UNet; config keys mirror the reference `unet_dict`
    (savi_ldm_movie_params-res128.py:85-101)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    use_checkpoint: bool = False
    num_head_channels: int = 32
    resblock_updown: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    attn_backend: str = "einsum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context=None, train=False):
        """x: [B, H, W, C_in]; timesteps: [B]; context: [B, N, D] slots."""
        res_block = ResBlock
        if self.use_checkpoint:
            res_block = nn.remat(ResBlock, static_argnums=(3,))

        temb = timestep_embedding(timesteps, self.model_channels)
        temb = temb.astype(self.dtype)
        temb = nn.Dense(self.model_channels * 4, dtype=self.dtype)(temb)
        temb = nn.Dense(self.model_channels * 4, dtype=self.dtype)(
            nn.silu(temb))

        def attn(ch, name):
            return SpatialTransformer(
                channels=ch,
                num_heads=ch // self.num_head_channels,
                head_dim=self.num_head_channels,
                depth=self.transformer_depth,
                context_dim=self.context_dim,
                attn_backend=self.attn_backend,
                dtype=self.dtype,
                name=name)

        h = nn.Conv(self.model_channels, (3, 3), dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        hs = [h]
        ds = 1
        # encoder
        for level, mult in enumerate(self.channel_mult):
            ch = mult * self.model_channels
            for i in range(self.num_res_blocks):
                h = res_block(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"down{level}_res{i}")(h, temb, train)
                if ds in self.attention_resolutions:
                    h = attn(ch, f"down{level}_attn{i}")(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res_block(
                        out_channels=ch, dropout=self.dropout, down=True,
                        dtype=self.dtype, name=f"down{level}_ds")(
                            h, temb, train)
                else:
                    h = Downsample(ch, self.conv_resample, dtype=self.dtype,
                                   name=f"down{level}_ds")(h)
                hs.append(h)
                ds *= 2

        # middle
        ch = self.channel_mult[-1] * self.model_channels
        h = res_block(out_channels=ch, dropout=self.dropout,
                      dtype=self.dtype, name="mid_res1")(h, temb, train)
        h = attn(ch, "mid_attn")(h, context)
        h = res_block(out_channels=ch, dropout=self.dropout,
                      dtype=self.dtype, name="mid_res2")(h, temb, train)

        # decoder with skip concat
        for level in reversed(range(len(self.channel_mult))):
            ch = self.channel_mult[level] * self.model_channels
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res_block(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"up{level}_res{i}")(h, temb, train)
                if ds in self.attention_resolutions:
                    h = attn(ch, f"up{level}_attn{i}")(h, context)
                if level > 0 and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res_block(
                            out_channels=ch, dropout=self.dropout, up=True,
                            dtype=self.dtype, name=f"up{level}_us")(
                                h, temb, train)
                    else:
                        h = Upsample(ch, self.conv_resample,
                                     dtype=self.dtype,
                                     name=f"up{level}_us")(h)
                    ds //= 2

        h = GroupNorm32(dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=zero_init,
                    dtype=jnp.float32, name="conv_out")(h)
        return h
