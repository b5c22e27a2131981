"""Shared neural building blocks (flax.linen, NHWC layout).

TPU-native equivalents of the reference's L1 layer:
- `conv_norm_act` / `deconv_norm_act` conv blocks (`nerv.models`, used at
  img_based/models/slot_attention.py:225-272)
- `SoftPositionEmbed` / `build_grid` (video_based/models/utils.py:37-64)
- sinusoidal `timestep_embedding` (video_based/models/unet/utils.py:70-92)
- GroupNorm with fp32 accumulation, the analog of GroupNorm32
  (video_based/models/unet/utils.py:108-124)

All convs operate on NHWC tensors — the layout XLA:TPU prefers — instead of
the reference's NCHW.
"""

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Matches PyTorch's default Conv2d initialization (kaiming_uniform with
# a=sqrt(5)), which the reference relies on implicitly for its CNNs.
conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")
default_dense_init = nn.initializers.lecun_normal()


class _GNAffine(nn.Module):
    """Param holder for GroupNorm scale/bias.

    Named "GroupNorm_0" by GroupNorm32 so the param tree is byte-identical
    to the earlier flax.linen.GroupNorm-backed implementation (checkpoints
    stay loadable).
    """

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32))


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 regardless of input dtype.

    TPU analog of the reference's GroupNorm32 (unet/utils.py:108-124):
    normalization statistics are accumulated in fp32 for bf16 activations.

    `act='silu'` fuses the activation that always follows GN in ResBlocks
    (reference unet.py:182-285); `fused=True` routes 4D inputs through the
    single-HBM-pass Pallas kernel (ops/fused_norm.py) when the shape
    supports it — numerics match the jnp path to f32 rounding.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.fused_norm import (fused_gn_supported, fused_group_norm,
                                      group_norm_reference)

        if isinstance(x, (tuple, list)):
            return self._split_call(tuple(x))
        num_groups = min(self.num_groups, x.shape[-1])
        # find a divisor if channels not divisible by num_groups
        while x.shape[-1] % num_groups != 0:
            num_groups -= 1
        scale, bias = _GNAffine(x.shape[-1], name="GroupNorm_0")()
        if self.fused and not self.is_initializing() and \
                fused_gn_supported(x.shape, num_groups):
            return fused_group_norm(x, scale, bias, num_groups,
                                    self.epsilon, self.act)
        return group_norm_reference(x, scale, bias, num_groups,
                                    self.epsilon, self.act)

    def _split_call(self, parts):
        """GroupNorm over the channel-concat of `parts` WITHOUT
        materializing the concat: group statistics are assembled from
        per-channel spatial moments of each part (numerically the same
        mean/biased-var as the direct formulation, f32 accumulation), and
        each part is normalized with its slice of the affine params.
        Returns the tuple of normalized (+activated) parts. Params are
        identical to the unsplit module, so checkpoints interchange.
        Used by the UNet decoder's skip-concat ResBlocks
        (unet.py:ResBlock `skip=`) to skip the concat HBM round-trip.
        """
        C = sum(p.shape[-1] for p in parts)
        num_groups = min(self.num_groups, C)
        while C % num_groups != 0:
            num_groups -= 1
        scale, bias = _GNAffine(C, name="GroupNorm_0")()
        B = parts[0].shape[0]
        n_spatial = 1
        for d in parts[0].shape[1:-1]:
            n_spatial *= d
        red_axes = tuple(range(1, parts[0].ndim - 1))
        s1 = jnp.concatenate(
            [p.astype(jnp.float32).sum(axis=red_axes) for p in parts], -1)
        s2 = jnp.concatenate(
            [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=red_axes)
             for p in parts], -1)  # [B, C]
        csize = C // num_groups
        cnt = float(n_spatial * csize)
        g1 = s1.reshape(B, num_groups, csize).sum(-1) / cnt
        g2 = s2.reshape(B, num_groups, csize).sum(-1) / cnt
        inv = jax.lax.rsqrt(g2 - jnp.square(g1) + self.epsilon)
        mean_c = jnp.repeat(g1, csize, axis=-1)  # [B, C]
        inv_c = jnp.repeat(inv, csize, axis=-1)
        a = inv_c * scale.astype(jnp.float32)[None]
        b = bias.astype(jnp.float32)[None] - mean_c * a
        outs = []
        off = 0
        bshape = (B,) + (1,) * (parts[0].ndim - 2)
        for p in parts:
            cp = p.shape[-1]
            ap = a[:, off:off + cp].reshape(*bshape, cp)
            bp = b[:, off:off + cp].reshape(*bshape, cp)
            y = p.astype(jnp.float32) * ap + bp
            if self.act == "silu":
                y = y * jax.nn.sigmoid(y)
            outs.append(y.astype(p.dtype))
            off += cp
        return tuple(outs)


def get_norm(norm: str, dtype=jnp.float32):
    """Map a norm name to a linen module factory. '' means identity."""
    if not norm:
        return None
    if norm in ("gn", "group_norm", "groupnorm"):
        return GroupNorm32(dtype=dtype)
    if norm in ("ln", "layer_norm", "layernorm"):
        return nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    raise ValueError(f"Unsupported norm: {norm!r}")


def get_act(act: str) -> Optional[Callable]:
    if not act:
        return None
    return {
        "relu": nn.relu,
        "silu": nn.silu,
        "swish": nn.silu,
        "gelu": nn.gelu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
    }[act]


class ConvNormAct(nn.Module):
    """Conv2D -> (norm) -> (act). NHWC.

    Equivalent of `nerv.models.conv_norm_act` as used by the reference's SA
    CNN encoder (img_based/models/slot_attention.py:225-235).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = ""
    act: str = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
        )(x)
        norm = get_norm(self.norm, self.dtype)
        if norm is not None:
            x = norm(x)
        act = get_act(self.act)
        if act is not None:
            x = act(x)
        return x


class DeconvNormAct(nn.Module):
    """ConvTranspose2D -> (norm) -> (act). NHWC.

    Equivalent of `nerv.models.deconv_norm_act` used by the spatial-broadcast
    decoder (img_based/models/slot_attention.py:259-272): torch
    `ConvTranspose2d(k, s, padding=k//2, output_padding=s-1)` per the
    reference's `deconv_out_shape` arithmetic, so output spatial size is
    exactly `s`x the input. The explicit (lo, hi) padding reproduces torch's
    asymmetric crop — `padding="SAME"` picks a different split at stride 2
    (pixel alignment shifts by one), which broke bit-parity of converted
    reference checkpoints (caught by test_sa_full_model_matches_reference).
    """

    out_channels: int
    kernel_size: int = 5
    stride: int = 2
    norm: str = ""
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.kernel_size - 1 - self.kernel_size // 2
        hi = lo + self.stride - 1
        x = nn.ConvTranspose(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((lo, hi), (lo, hi)),
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
        )(x)
        norm = get_norm(self.norm, self.dtype)
        if norm is not None:
            x = norm(x)
        act = get_act(self.act)
        if act is not None:
            x = act(x)
        return x


def build_grid(resolution: Tuple[int, int]) -> jnp.ndarray:
    """Return a [1, H, W, 4] grid of (y, x, 1-y, 1-x) in [0, 1].

    Matches reference video_based/models/utils.py:37-44.
    """
    h, w = resolution
    ys = jnp.linspace(0.0, 1.0, h)
    xs = jnp.linspace(0.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gy, gx], axis=-1)  # [H, W, 2]
    grid = grid[None]  # [1, H, W, 2]
    return jnp.concatenate([grid, 1.0 - grid], axis=-1)  # [1, H, W, 4]


class SoftPositionEmbed(nn.Module):
    """Adds a learned linear projection of a normalized coordinate grid.

    NHWC equivalent of reference SoftPositionEmbed
    (video_based/models/utils.py:52-64).
    """

    hidden_size: int
    resolution: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        # inputs: [B, H, W, C]
        grid = build_grid(self.resolution).astype(self.dtype)
        emb = nn.Dense(
            self.hidden_size, dtype=self.dtype,
            kernel_init=default_dense_init)(grid)
        return inputs + emb


class MLP(nn.Module):
    """Simple MLP with configurable hidden dims and activation."""

    hidden_dims: Sequence[int]
    out_dim: int
    act: str = "relu"
    pre_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        act = get_act(self.act)
        for d in self.hidden_dims:
            x = act(nn.Dense(d, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


def timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal timestep embeddings.

    Matches reference video_based/models/unet/utils.py:70-92: half cos / half
    sin with frequencies exp(-log(max_period) * i / half).

    Args:
        timesteps: [B] float or int array of timestep indices.
        dim: output embedding dimension.

    Returns:
        [B, dim] float32 embeddings.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) *
        jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def cosine_anneal(step, start_value, final_value, start_step, final_step):
    """Cosine annealing from start_value to final_value over steps.

    Matches reference steve_utils.py:54-69 (used to anneal dVAE gumbel tau).
    Works with python scalars or jnp arrays.
    """
    if final_step <= start_step:
        return final_value
    a = 0.5 * (start_value - final_value)
    b = 0.5 * (start_value + final_value)
    progress = (step - start_step) / (final_step - start_step)
    progress = jnp.clip(progress, 0.0, 1.0)
    return b + a * jnp.cos(math.pi * progress)


def linear_anneal(step, start_value, final_value, start_step, final_step):
    """Linear annealing, the `linear_warmup` analog (steve_utils.py)."""
    if final_step <= start_step:
        return final_value
    progress = (step - start_step) / (final_step - start_step)
    progress = jnp.clip(progress, 0.0, 1.0)
    return start_value + (final_value - start_value) * progress


def gumbel_softmax(rng, logits, tau=1.0, hard=False, axis=-1):
    """Gumbel-softmax with the exponential-sample trick.

    Matches reference steve_utils.py:27-40: gumbels from -log(Exp(1)),
    straight-through hard one-hot when `hard=True`.
    """
    eps = jnp.finfo(logits.dtype).tiny
    exp_sample = jax.random.exponential(rng, logits.shape, logits.dtype)
    gumbels = -jnp.log(jnp.maximum(exp_sample, eps))
    y = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y, axis=axis)
        y_hard = jax.nn.one_hot(idx, logits.shape[axis], axis=axis,
                                dtype=y.dtype)
        # straight-through: forward value = y_hard, gradient flows through y
        y = y + jax.lax.stop_gradient(y_hard - y)
    return y


def straight_through(value, grad_path):
    """Return `value` in the forward pass with gradients of `grad_path`."""
    return grad_path + jax.lax.stop_gradient(value - grad_path)
