"""Fused GroupNorm(+SiLU) Pallas kernel.

The UNet's hot elementwise pattern is GN -> SiLU(-> conv) (ResBlock,
reference video_based/models/unet/unet.py:182-285). XLA computes the
group statistics in one HBM pass and normalizes in a second, so each GN
costs ~2 reads + 1 write of the feature map. This kernel loads each
sample's [H*W, C] block into VMEM once, computes the per-group moments
in f32, normalizes, applies the optional SiLU, and writes — 1 read +
1 write, saving ~1/3 of the GN-chain HBM traffic (the measured bound:
scripts/bench_unet_breakdown.py).

Group reduction/expansion is formulated as tiny matmuls against a
[C, G] one-hot group-assignment matrix, so everything stays 2D and
MXU/VPU-friendly (no lane-dim reshapes).

Training uses `jax.custom_vjp`: the forward runs the kernel; the backward
replays the jnp reference formula under `jax.vjp` (identical cost to the
unfused path, which is what training pays today anyway).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-sample VMEM budget for the x block (bf16/f32 copies + temps)
_VMEM_X_LIMIT = 4 * 1024 * 1024


def group_norm_reference(x, scale, bias, num_groups, eps=1e-5, act=None):
    """jnp reference: GroupNorm over NHWC (stats in f32) + optional SiLU.

    Matches flax.linen.GroupNorm numerics (f32 statistics, biased var).
    """
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(B, -1, num_groups, C // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale.astype(jnp.float32) + \
        bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, act):
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    HW, C = x.shape
    G = num_groups
    # one-hot group-assignment matrix M[c, g] = (c // (C/G) == g)
    cg = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0) // (C // G)
    gg = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (cg == gg).astype(jnp.float32)  # [C, G]

    s1 = jnp.sum(x, axis=0, keepdims=True)        # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)    # [1, C]
    g1 = jnp.dot(s1, M, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, M, preferred_element_type=jnp.float32)
    cnt = float(HW * (C // G))
    mean_g = g1 / cnt
    var_g = g2 / cnt - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # expand back to per-channel affine: y = x * a + b
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)  # [1, C] block -> [C]
    bias = bias_ref[0].astype(jnp.float32)
    a = inv_c[0] * scale
    b = bias - mean_c[0] * a
    y = x * a + b
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_pallas(x, scale, bias, num_groups, eps, act, interpret=False):
    """x: [B, HW, C] -> same shape."""
    B, HW, C = x.shape
    kernel = functools.partial(
        _gn_kernel, num_groups=num_groups, eps=eps, act=act)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
    )(x, scale.reshape(1, C), bias.reshape(1, C))


def fused_gn_supported(shape, num_groups, interpret=False):
    """Kernel applicability: TPU backend (or interpret mode for tests),
    NHWC, lane-aligned C, divisible groups, per-sample block within the
    VMEM budget."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    if len(shape) != 4:
        return False
    _, H, W, C = shape
    if C % num_groups != 0 or C % 128 != 0:
        return False
    hw = H * W
    if hw % 8 != 0 and hw < 8:
        return False
    # f32 working copy + bf16 in/out copies, double-buffered
    if hw * C * 4 * 2 > _VMEM_X_LIMIT:
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm(x, scale, bias, num_groups, eps=1e-5, act=None,
                     interpret=False):
    """GroupNorm(+SiLU) on NHWC via a single-pass Pallas kernel.

    Falls back to the jnp reference when the shape is unsupported. The
    backward pass replays the reference formula (see module docstring).
    """
    if not fused_gn_supported(x.shape, num_groups, interpret):
        return group_norm_reference(x, scale, bias, num_groups, eps, act)
    B, H, W, C = x.shape
    y = _gn_pallas(x.reshape(B, H * W, C), scale, bias, num_groups, eps,
                   act, interpret)
    return y.reshape(B, H, W, C)


def _fgn_fwd(x, scale, bias, num_groups, eps, act, interpret):
    y = fused_group_norm(x, scale, bias, num_groups, eps, act, interpret)
    return y, (x, scale, bias)


def _fgn_bwd(num_groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_reference(
            x_, s_, b_, num_groups, eps, act), x, scale, bias)
    return vjp(g)


fused_group_norm.defvjp(_fgn_fwd, _fgn_bwd)
