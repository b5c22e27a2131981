"""Winograd F(2x2,3x3) conv kernel: math parity (interpret mode).

The kernel is a documented NEGATIVE perf result on v5e (BASELINE.md:
167us vs XLA direct's 57us at the flagship level-0 shape — XLA's direct
conv runs at 86% MFU and the VPU-side tile transforms cost more than the
2.25x MAC reduction saves), kept as measured optimization-surface
infrastructure. These tests pin the transform math and the custom-vjp
backward so the kernel stays correct if revisited on future hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.ops.winograd_conv import (
    _direct_conv, winograd_conv3x3, winograd_weights)

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("shape,f", [((2, 8, 8, 128), 128),
                                     ((1, 4, 6, 128), 128)])
def test_winograd_matches_direct(shape, f):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (3, 3, shape[-1], f), jnp.float32) * 0.05
    y = winograd_conv3x3(x, w, True)   # interpret mode
    y_ref = _direct_conv(x, w)
    # transformed-domain matmuls run in bf16 -> bf16-class tolerance
    err = float(jnp.max(jnp.abs(y - y_ref)))
    scale = float(jnp.max(jnp.abs(y_ref)))
    assert err < 2e-2 * max(scale, 1.0)


def test_winograd_weight_transform_identity():
    # a delta kernel at the center tap transforms to G[:,1] x G[:,1]
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0
    u = np.asarray(winograd_weights(jnp.asarray(w))).reshape(4, 4)
    g1 = np.array([0, 0.5, -0.5, 0], np.float32)  # G[:, 1]
    np.testing.assert_allclose(u, np.outer(g1, g1), atol=1e-6)


def test_winograd_backward_is_direct_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128)) * 0.05

    def loss_wino(w):
        return jnp.sum(winograd_conv3x3(x, w, True) ** 2)

    def loss_direct(w):
        return jnp.sum(_direct_conv(x, w) ** 2)

    g_w = jax.grad(loss_wino)(w)
    g_d = jax.grad(loss_direct)(w)
    # backward replays the direct conv's vjp on the (bf16-rounded)
    # forward cotangent; same tolerance class as the forward
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_d),
                               atol=0.5, rtol=0.1)
