"""Fused MHA Pallas kernel parity (ops/attention_kernel.py).

Interpreter-mode runs on the CPU mesh against the einsum reference at the
UNet's real shapes (self-attention at all three resolutions + 15-slot
cross-attention with key padding), plus gradient parity through the
custom_vjp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slotdiffusion_tpu.ops.attention_kernel import (fused_mha,
                                                    fused_mha_supported,
                                                    mha_reference)

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("nq,nk,hd,heads", [
    (256, 256, 256, 8),    # ds2 self-attention
    (64, 64, 384, 12),     # ds4 self-attention
    (16, 16, 512, 16),     # ds8/mid self-attention
    (256, 15, 256, 8),     # ds2 cross-attention over 15 slots (pads keys)
    (64, 15, 384, 12),     # ds4 cross-attention
])
def test_kernel_matches_reference(nq, nk, hd, heads, rng):
    B = 2
    q = jnp.asarray(rng.randn(B, nq, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(B, nk, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(B, nk, hd).astype(np.float32))
    ref = mha_reference(q, k, v, heads)
    out = fused_mha(q, k, v, heads, None, True)  # interpret=True
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_parity(rng):
    B, N, HD, H = 2, 64, 256, 8
    q = jnp.asarray(rng.randn(B, N, HD).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, 15, HD).astype(np.float32)).astype(
        jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, 15, HD).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = mha_reference(q, k, v, H)
    out = fused_mha(q, k, v, H, None, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_gradients_match_reference(rng):
    B, N, HD, H = 1, 16, 128, 4
    q = jnp.asarray(rng.randn(B, N, HD).astype(np.float32))
    k = jnp.asarray(rng.randn(B, N, HD).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, HD).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_ref = jax.grad(loss(lambda q, k, v: mha_reference(q, k, v, H)),
                     argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss(lambda q, k, v: fused_mha(q, k, v, H, None,
                                                    True)),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gating():
    f32 = jnp.float32
    assert fused_mha_supported((2, 256, 256), (2, 256, 256), 8, f32, True)
    assert fused_mha_supported((2, 256, 256), (2, 15, 256), 8, f32, True)
    # HD not lane-aligned
    assert not fused_mha_supported((2, 256, 192), (2, 15, 192), 6, f32,
                                   True)
    # Nq not sublane-aligned
    assert not fused_mha_supported((2, 100, 256), (2, 100, 256), 8, f32,
                                   True)
    # CPU backend without interpret
    assert not fused_mha_supported((2, 256, 256), (2, 256, 256), 8, f32,
                                   False)


def test_unet_attention_fused_backend(rng):
    """models/unet._attention dispatches to the kernel and matches the
    einsum backend."""
    from slotdiffusion_tpu.models.unet import _attention

    B, N, HD, H = 2, 32, 256, 8
    q = jnp.asarray(rng.randn(B, N, HD).astype(np.float32))
    k = jnp.asarray(rng.randn(B, 15, HD).astype(np.float32))
    v = jnp.asarray(rng.randn(B, 15, HD).astype(np.float32))
    ein = _attention(q, k, v, H, jnp.float32, backend="einsum")
    # on CPU the fused backend falls back to the (identical) reference
    fus = _attention(q, k, v, H, jnp.float32, backend="fused")
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ein),
                               rtol=2e-5, atol=2e-5)
