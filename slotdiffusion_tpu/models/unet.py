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


def _fast_softmax(logits, axis=-1):
    """Softmax without the max-subtraction passes.

    For any constant c, softmax(x) == exp(x-c)/sum(exp(x-c)) exactly; the
    max-subtraction exists only to bound the exp argument. Here logits are
    f32 products of LayerNorm'd bf16 activations scaled by D^-0.5, so
    |logits| << 60 in practice and the result is bit-exact softmax. The
    two-sided clamp makes the pathological tails safe rather than exact:
    exp(60)*Nk stays finite in f32 for any realistic Nk (no inf/NaN), and
    exp(-60) ~= 8.8e-27 is far above f32 underflow, so an all-negative row
    still yields a proper distribution (never the all-zero row a one-sided
    clamp allowed). Outside +-60 the distribution is mildly flattened —
    only reachable with non-normalized inputs.
    Measured on v5e (scripts/bench_unet_variants.py): the two removed
    reduce/broadcast passes over the f32 logits are worth ~0.4ms/step on
    the flagship UNet (184 -> 199 steps/s); the clip costs the same as the
    previous one-sided minimum.
    """
    e = jnp.exp(jnp.clip(logits, -60.0, 60.0))
    return e / jnp.sum(e, axis=axis, keepdims=True)


def _attention(q, k, v, num_heads, dtype, backend="einsum",
               softmax="fast"):
    """Multi-head attention over token dims.

    q: [B, Nq, H*D], k/v: [B, Nk, H*D] -> [B, Nq, H*D].

    Backend is a model-config knob (`unet_dict['attn_backend']`):
    - "einsum": explicit f32-softmax einsum chain.
    - "dpa": jax.nn.dot_product_attention.
    - "auto": einsum for long token rows, dpa below 256 tokens —
      per-resolution A/B on TPU v5e (scripts/bench_attention.py) measured
      einsum winning at N=256 but dpa winning at N=64/16; in full-model
      context the difference vanished (scripts/bench_unet_variants.py), so
      "einsum" stays the default.
    Einsum logits/softmax stay f32 end-to-end — matching the reference's
    fp32 QKVAttention (unet.py:334) — and only the softmax weights are
    cast to the compute dtype for the value matmul. `softmax` picks the
    fast (no max-subtraction) or numerically-stable jax.nn.softmax
    variant (`unet_dict['attn_softmax']`).
    """
    B, Nq, HD = q.shape
    Nk = k.shape[1]
    D = HD // num_heads
    if backend == "fused":
        from ..ops.attention_kernel import fused_mha
        return fused_mha(q, k, v, num_heads)
    q = q.reshape(B, Nq, num_heads, D)
    k = k.reshape(B, Nk, num_heads, D)
    v = v.reshape(B, Nk, num_heads, D)
    if backend == "auto":
        backend = "einsum" if Nq >= 256 else "dpa"
    if backend == "einsum":
        scale = D ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        sm = _fast_softmax if softmax == "fast" else jax.nn.softmax
        weights = sm(logits, axis=-1).astype(dtype)
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
    attn_softmax: str = "fast"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = _attention(q, k, v, self.num_heads, self.dtype,
                         backend=self.attn_backend,
                         softmax=self.attn_softmax)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim * 2, dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # torch F.gelu (reference attention.py:37-44) is the exact erf
        # form; under f32 we match it bit-for-bit. Under bf16 compute the
        # tanh approximation is used instead: its error (<3e-4 absolute)
        # is ~25x below bf16 quantization, while erf lowers to a slow
        # polynomial on the TPU VPU (~0.8 ms/step on the flagship UNet —
        # measured 207.4 vs 177.4 steps/s, round-3 bisect).
        exact = jnp.dtype(self.dtype) == jnp.dtype(jnp.float32)
        return h * nn.gelu(gate, approximate=not exact)


class TransformerBlock(nn.Module):
    """Pre-norm: self-attn -> cross-attn(context) -> GEGLU FFN, all residual
    (reference attention.py:209-251)."""

    dim: int
    num_heads: int
    head_dim: int
    context_dim: Optional[int] = None
    attn_backend: str = "einsum"
    attn_softmax: str = "fast"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(
            query_dim=self.dim, context_dim=None,
            num_heads=self.num_heads, head_dim=self.head_dim,
            attn_backend=self.attn_backend,
            attn_softmax=self.attn_softmax,
            dtype=self.dtype, name="attn1")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        x = x + CrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            num_heads=self.num_heads, head_dim=self.head_dim,
            attn_backend=self.attn_backend,
            attn_softmax=self.attn_softmax,
            dtype=self.dtype, name="attn2")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x), context=context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
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
    attn_softmax: str = "fast"
    fused_gn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        # eps 1e-6: the reference's SpatialTransformer uses Normalize()
        # (attention.py:76-78), not the eps-1e-5 GroupNorm32 of ResBlocks
        h = GroupNorm32(epsilon=1e-6, fused=self.fused_gn,
                        dtype=self.dtype)(x)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(h)
        h = h.reshape(B, H * W, self.channels)
        for i in range(self.depth):
            h = TransformerBlock(
                dim=self.channels, num_heads=self.num_heads,
                head_dim=self.head_dim, context_dim=self.context_dim,
                attn_backend=self.attn_backend,
                attn_softmax=self.attn_softmax,
                dtype=self.dtype, name=f"block{i}")(h, context=context)
        h = h.reshape(B, H, W, self.channels)
        h = nn.Conv(self.channels, (1, 1), kernel_init=zero_init,
                    dtype=self.dtype)(h)
        return x + h


class _SplitInConv(nn.Module):
    """Conv whose single [kh, kw, C_total, F] kernel is applied to a
    TUPLE of channel-concat parts as per-part convs summed — exactly
    conv(concat(parts)) without materializing the concat. Param layout
    identical to nn.Conv."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, parts):
        C = sum(p.shape[-1] for p in parts)
        kh, kw = self.kernel_size
        W = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, C, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        out = None
        off = 0
        for p in parts:
            cp = p.shape[-1]
            wp = W[:, :, off:off + cp].astype(self.dtype)
            dn = jax.lax.conv_dimension_numbers(
                p.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype), wp, (1, 1), pad,
                dimension_numbers=dn)
            out = y if out is None else out + y
            off += cp
        return out + b.astype(self.dtype)


class ResBlock(nn.Module):
    """GN -> SiLU -> conv, +time-emb FiLM-add, GN -> SiLU -> zero-init conv,
    residual with 1x1 skip on channel change (reference unet.py:182-285).
    Optional fused up/downsampling applied to both paths.

    `fused_gn=True` runs each GN+SiLU pair as one single-HBM-pass Pallas
    kernel (ops/fused_norm.py) on TPU; numerics match to f32 rounding.

    When `skip` is given, the block computes on the channel-concat
    (x ++ skip) EXACTLY but without materializing it: GroupNorm stats
    come from per-channel moments of both parts (GroupNorm32 tuple call)
    and the consuming convs slice their kernels per part (_SplitInConv).
    Params are identical to the concat formulation, so the knob can flip
    freely on existing checkpoints. Measured A/B: scripts/bench_unet_variants.
    """

    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    fused_gn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train=False, skip=None):
        if skip is not None:
            assert not (self.up or self.down)
            hx, hs = GroupNorm32(act="silu", fused=self.fused_gn,
                                 dtype=self.dtype,
                                 name="GroupNorm32_0")((x, skip))
            h = _SplitInConv(self.out_channels, (3, 3), dtype=self.dtype,
                             name="Conv_0")((hx, hs))
        else:
            h = GroupNorm32(act="silu", fused=self.fused_gn,
                            dtype=self.dtype, name="GroupNorm32_0")(x)
            if self.up:
                h = _upsample2x(h)
                x = _upsample2x(x)
            elif self.down:
                h = _avgpool2x(h)
                x = _avgpool2x(x)
            h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        name="Conv_0")(h)
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype,
                           name="Dense_0")(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm32(act="silu", fused=self.fused_gn,
                        dtype=self.dtype, name="GroupNorm32_1")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=zero_init,
                    dtype=self.dtype, name="Conv_1")(h)
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        if in_ch != self.out_channels:
            if skip is not None:
                x = _SplitInConv(self.out_channels, (1, 1),
                                 dtype=self.dtype, name="Conv_2")((x, skip))
            else:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name="Conv_2")(x)
        elif skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
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
            # explicit (1,1) padding: torch's stride-2 pad-1 conv centers
            # windows on even rows (2i-1..2i+1); XLA "SAME" would pad
            # (0,1) and center on odd rows — off-by-one vs the reference
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        return _avgpool2x(x)


class _PhaseUpConv(nn.Module):
    """nearest-x2 followed by a 3x3 conv, computed as four 2x2 convs on
    the coarse grid + depth-to-space interleave.

    Every fine-grid output phase (a, b) of conv3x3(nearest2x(x)) reads a
    fixed 2x2 coarse neighborhood whose taps are sums of adjacent 3x3
    weights (row taps for phase a=0: [W0, W1+W2]; a=1: [W0+W1, W2];
    same per column), so the rewrite is EXACT (verified to 1e-6 under
    f32 matmul precision, scripts/bench_unet_variants.py) while doing 16
    MACs/output instead of 36 and never materializing the 4x-upsampled
    tensor. Params are identical to the nn.Conv it replaces
    (kernel [3,3,Cin,Cout] + bias [Cout]) so checkpoints interchange.
    Measured on v5e: +175us/step on the flagship UNet (198 -> 205
    steps/s); the weight recombination is loop-invariant and hoisted by
    XLA out of sampling/training loops.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        W = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        Wf = W.astype(jnp.float32)
        rows = {0: (Wf[0], Wf[1] + Wf[2]), 1: (Wf[0] + Wf[1], Wf[2])}

        def phase_kernel(a, bb):
            def cols(Wr):  # Wr: [3, Cin, Cout]
                return {0: (Wr[0], Wr[1] + Wr[2]),
                        1: (Wr[0] + Wr[1], Wr[2])}[bb]
            r0, r1 = rows[a]
            c00, c01 = cols(r0)
            c10, c11 = cols(r1)
            k = jnp.stack([jnp.stack([c00, c01], 0),
                           jnp.stack([c10, c11], 0)], 0)
            return k.astype(self.dtype)  # [2, 2, Cin, Cout]

        xd = x.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            xd.shape, (2, 2, C, self.features), ("NHWC", "HWIO", "NHWC"))
        outs = []
        for a in (0, 1):
            for bb in (0, 1):
                pad = ((1 - a, a), (1 - bb, bb))
                outs.append(jax.lax.conv_general_dilated(
                    xd, phase_kernel(a, bb), (1, 1), pad,
                    dimension_numbers=dn))
        B, H, Wd, F = outs[0].shape
        z = jnp.stack(outs, 0).reshape(2, 2, B, H, Wd, F)
        z = z.transpose(2, 3, 0, 4, 1, 5).reshape(B, 2 * H, 2 * Wd, F)
        return (z + b.astype(self.dtype)).astype(xd.dtype)


class Upsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    # exact phase-conv rewrite of nearest2x + conv3x3 (see _PhaseUpConv);
    # False = direct formulation (used by bench.py's FLOP accounting and
    # as a numerics cross-check — both paths share the Conv_0 params)
    phase: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv and self.phase:
            return _PhaseUpConv(self.out_channels, dtype=self.dtype,
                                name="Conv_0")(x)
        x = _upsample2x(x)
        if self.use_conv:
            x = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        name="Conv_0")(x)
        return x


@jax.custom_vjp
def _conv3x3_bf16_acc_f32(x16, w16):
    """3x3 SAME conv: bf16 operands, f32 accumulation/output.

    JAX's conv transpose rule rejects the mixed (f32 cotangent, bf16
    operand) pair that `preferred_element_type=f32` produces under AD, so
    the backward is supplied explicitly: gradients are computed by the
    plain bf16 conv VJP on a bf16-cast cotangent — exactly torch AMP's
    backward (autocast runs grad convs in half precision too). The
    forward is byte-identical to the pre-custom_vjp program.
    """
    dn = jax.lax.conv_dimension_numbers(
        x16.shape, w16.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x16, w16, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32)


def _conv3x3_bf16_fwd(x16, w16):
    return _conv3x3_bf16_acc_f32(x16, w16), (x16, w16)


def _conv3x3_bf16_bwd(res, g):
    x16, w16 = res
    dn = jax.lax.conv_dimension_numbers(
        x16.shape, w16.shape, ("NHWC", "HWIO", "NHWC"))

    def conv16(a, b):
        return jax.lax.conv_general_dilated(
            a, b, (1, 1), "SAME", dimension_numbers=dn)

    _, vjp = jax.vjp(conv16, x16, w16)
    return vjp(g.astype(jnp.bfloat16))


_conv3x3_bf16_acc_f32.defvjp(_conv3x3_bf16_fwd, _conv3x3_bf16_bwd)


class _ConvOutBf16Acc(nn.Module):
    """Zero-init 3x3 output conv: bf16 operands, f32 accumulation/output.

    Param layout identical to nn.Conv (kernel/bias), so it swaps with the
    f32 `conv_out` without checkpoint changes. Differentiable: f32 master
    weights get their gradient through the outer bf16 cast (torch-AMP
    semantics), see `_conv3x3_bf16_acc_f32`.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        W = self.param("kernel", zero_init, (3, 3, C, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        y = _conv3x3_bf16_acc_f32(
            x.astype(jnp.bfloat16), W.astype(jnp.bfloat16))
        return y + b


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
    attn_softmax: str = "fast"
    # In-context A/B (scripts/bench_unet_variants.py): the fused-GN Pallas kernel
    # LOSES at the flagship scale (6.7 vs 5.36 ms/step) — XLA already fuses
    # GN stats into the producer and normalize+SiLU into the consumer, so
    # the kernel's materialization boundary adds traffic. Kept as an
    # optimization surface behind this knob, like the SA kernel.
    fused_gn: bool = False
    # "f32": reference-exact f32 final conv; "bf16": bf16 operands with
    # f32 accumulation (reference AMP behavior; measured A/B in
    # scripts/bench_unet_variants.py)
    conv_out_compute: str = "f32"
    # phase-conv decoder upsample (exact rewrite, +3.5% step rate on v5e;
    # False = reference-direct nearest2x+conv, same params)
    phase_upsample: bool = True
    # compute decoder concat ResBlocks directly on (h, skip) pairs —
    # exact (CPU parity 2.7e-7 rel), same params; +92us/step on v5e
    # (scripts/bench_unet_variants.py concat_decoder A/B: 203.7 -> 207.6 steps/s)
    split_skip: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context=None, train=False):
        """x: [B, H, W, C_in]; timesteps: [B]; context: [B, N, D] slots."""
        import functools
        res_block = functools.partial(ResBlock, fused_gn=self.fused_gn)
        if self.use_checkpoint:
            res_block = functools.partial(
                nn.remat(ResBlock, static_argnums=(3,)),
                fused_gn=self.fused_gn)

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
                attn_softmax=self.attn_softmax,
                fused_gn=self.fused_gn,
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

        # decoder with skip concat (split_skip computes the concat
        # blocks without materializing the concat — exact, same params)
        for level in reversed(range(len(self.channel_mult))):
            ch = self.channel_mult[level] * self.model_channels
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                blk = res_block(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"up{level}_res{i}")
                if self.split_skip:
                    h = blk(h, temb, train, skip)
                else:
                    h = blk(jnp.concatenate([h, skip], axis=-1), temb,
                            train)
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
                                     phase=self.phase_upsample,
                                     dtype=self.dtype,
                                     name=f"up{level}_us")(h)
                    ds //= 2

        h = GroupNorm32(act="silu", fused=self.fused_gn,
                        dtype=self.dtype)(h)
        if self.conv_out_compute == "bf16":
            # bf16 operands + f32 MXU accumulation (the reference's AMP
            # runs its final conv in fp16 the same way, train.py --fp16):
            # with out_channels=3 the MXU pads N to a full tile, so f32
            # operand rate here buys nothing but time
            h = _ConvOutBf16Acc(self.out_channels, name="conv_out")(h)
        else:
            h = nn.Conv(self.out_channels, (3, 3), kernel_init=zero_init,
                        dtype=jnp.float32, name="conv_out")(h)
        return h
