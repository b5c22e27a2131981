"""GroupNorm ResNet encoder (SAVi-style small-input variant).

TPU-native re-implementation of the reference's modified torchvision ResNet
(video_based/models/resnet.py:150-233): GroupNorm(32) everywhere, a 3x3
stride-1 stem with no maxpool for small inputs, an optional layer4, and
optional dilation in place of the later strides. With `use_layer4=False` the
network downsamples by 4 and outputs 256 channels; with it, 8x and 512
channels (reference slot_attention.py:185-194).

NHWC layout; BasicBlock only (resnet18/34).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torchvision ResNet conv init: kaiming_normal(fan_out, relu)
resnet_conv_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal")


class _GN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = min(32, x.shape[-1])
        out = nn.GroupNorm(
            num_groups=g, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32)(x.astype(jnp.float32))
        return out.astype(x.dtype)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        # torch conv3x3 pads `dilation` on BOTH sides (resnet.py:12-29);
        # XLA's SAME pads (0, 1) for stride 2, which shifts the sampling
        # phase — explicit symmetric padding is required for parity
        pad = ((self.dilation, self.dilation),) * 2
        h = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=pad, use_bias=False, kernel_init=resnet_conv_init,
            dtype=self.dtype)(x)
        h = _GN(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.planes, (3, 3),
            kernel_dilation=(self.dilation, self.dilation),
            padding=pad, use_bias=False, kernel_init=resnet_conv_init,
            dtype=self.dtype)(h)
        h = _GN(dtype=self.dtype)(h)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=resnet_conv_init,
                dtype=self.dtype)(x)
            identity = _GN(dtype=self.dtype)(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    """Feature-map ResNet (no pooling head).

    Args:
        stage_sizes: blocks per stage, e.g. (2, 2, 2, 2) for resnet18.
        small_inputs: 3x3 stride-1 stem, no maxpool (reference :188-197).
        use_layer4: include the 512-channel stage (8x downsample total).
        replace_stride_with_dilation: per-stage (2..4) dilation flags.
    """

    stage_sizes: Sequence[int]
    small_inputs: bool = True
    use_layer4: bool = True
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.small_inputs:
            x = nn.Conv(
                64, (3, 3), padding="SAME", use_bias=False,
                kernel_init=resnet_conv_init, dtype=self.dtype)(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                use_bias=False, kernel_init=resnet_conv_init,
                dtype=self.dtype)(x)
        x = _GN(dtype=self.dtype)(x)
        x = nn.relu(x)
        if not self.small_inputs:
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        num_stages = 4 if self.use_layer4 else 3
        dilation = 1
        for stage in range(num_stages):
            stride = 1 if stage == 0 else 2
            # torchvision _make_layer semantics (resnet.py:266-279): the
            # stage's FIRST block keeps the pre-update dilation; only the
            # remaining blocks see the dilated rate
            prev_dilation = dilation
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            for blk in range(self.stage_sizes[stage]):
                first = blk == 0
                in_ch = x.shape[-1]
                x = BasicBlock(
                    planes=planes[stage],
                    stride=stride if first else 1,
                    dilation=prev_dilation if first else dilation,
                    downsample=first and (stride != 1
                                          or in_ch != planes[stage]),
                    dtype=self.dtype,
                )(x)
        return x


def resnet18(small_inputs=True, use_layer4=True,
             replace_stride_with_dilation=(False, False, False),
             dtype=jnp.float32):
    return ResNet(
        stage_sizes=(2, 2, 2, 2), small_inputs=small_inputs,
        use_layer4=use_layer4,
        replace_stride_with_dilation=tuple(replace_stride_with_dilation),
        dtype=dtype)


def resnet34(small_inputs=True, use_layer4=True,
             replace_stride_with_dilation=(False, False, False),
             dtype=jnp.float32):
    return ResNet(
        stage_sizes=(3, 4, 6, 3), small_inputs=small_inputs,
        use_layer4=use_layer4,
        replace_stride_with_dilation=tuple(replace_stride_with_dilation),
        dtype=dtype)
