"""Fused GroupNorm(+SiLU) kernel parity (ops/fused_norm.py).

Runs the Pallas kernel in interpreter mode on the CPU mesh and checks it
against the jnp reference and flax.linen.GroupNorm at the UNet's real
shapes, plus gradient parity through the custom_vjp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from slotdiffusion_tpu.ops.fused_norm import (fused_gn_supported,
                                              fused_group_norm,
                                              group_norm_reference)

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("shape,groups", [
    ((2, 32, 32, 128), 32),   # UNet level-0
    ((2, 16, 16, 256), 32),   # level-1
    ((2, 4, 4, 512), 32),     # bottom
    ((2, 8, 8, 640), 32),     # decoder concat (384+256)
])
def test_kernel_matches_reference(shape, groups, rng):
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    scale = jnp.asarray(rng.rand(shape[-1]).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32) * 0.1)
    for act in (None, "silu"):
        ref = group_norm_reference(x, scale, bias, groups, 1e-5, act)
        out = fused_group_norm(x, scale, bias, groups, 1e-5, act,
                               True)  # interpret=True on CPU
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_reference_matches_flax_groupnorm(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
    variables = gn.init(jax.random.PRNGKey(0), x)
    expected = gn.apply(variables, x)
    got = group_norm_reference(
        x, variables["params"]["scale"], variables["params"]["bias"],
        32, 1e-5, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_bf16_kernel_parity(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    ref = group_norm_reference(x, scale, bias, 32, 1e-5, "silu")
    out = fused_group_norm(x, scale, bias, 32, 1e-5, "silu", True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_gradients_match_reference(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    scale = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)

    def loss_f(fn):
        def f(x, s, b):
            y = fn(x, s, b)
            return jnp.sum(y ** 2 * jnp.cos(y))
        return f

    ref_fn = loss_f(lambda x, s, b: group_norm_reference(
        x, s, b, 32, 1e-5, "silu"))
    ker_fn = loss_f(lambda x, s, b: fused_group_norm(
        x, s, b, 32, 1e-5, "silu", True))
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, scale, bias)
    g_ker = jax.grad(ker_fn, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gating():
    assert not fused_gn_supported((2, 8, 8, 100), 32, True)  # C%128
    assert not fused_gn_supported((2, 8, 8), 32, True)       # not 4D
    assert fused_gn_supported((2, 8, 8, 256), 32, True)
    # CPU backend without interpret -> unsupported
    assert not fused_gn_supported((2, 8, 8, 256), 32, False)


def test_groupnorm32_param_tree_unchanged(rng):
    """The refactored GroupNorm32 must keep the flax.linen.GroupNorm tree
    ({'GroupNorm_0': {'scale','bias'}}) so round-1 checkpoints load."""
    from slotdiffusion_tpu.models.blocks import GroupNorm32

    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    m = GroupNorm32()
    variables = m.init(jax.random.PRNGKey(0), x)
    assert set(variables["params"]) == {"GroupNorm_0"}
    assert set(variables["params"]["GroupNorm_0"]) == {"scale", "bias"}
    # numerics identical to flax GroupNorm on the same params
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
    expected = gn.apply(
        {"params": variables["params"]["GroupNorm_0"]}, x)
    got = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_fast_softmax_matches_stable(rng):
    """_fast_softmax == jax.nn.softmax for bounded logits (the constant-
    shift identity), and stays finite at the clamp boundary."""
    from slotdiffusion_tpu.models.unet import _fast_softmax

    x = jnp.asarray(rng.randn(4, 8, 32, 32).astype(np.float32) * 10)
    np.testing.assert_allclose(
        np.asarray(_fast_softmax(x)), np.asarray(jax.nn.softmax(x)),
        rtol=1e-5, atol=1e-7)
    # pathological logits: clamped, finite, still a distribution
    big = jnp.asarray([[500.0, 400.0, 0.0]])
    w = np.asarray(_fast_softmax(big))
    assert np.isfinite(w).all()
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
