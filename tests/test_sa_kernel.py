"""Parity of the fused Pallas slot-attention kernel vs the pure-jnp twin.

Runs the kernel in interpreter mode on CPU; the same kernel code compiles
for TPU. Covers: multiple N-tiles (grid accumulation), slot padding
(S not a multiple of 8), the +eps renorm folding, GRU/MLP epilogue, and
the last-iteration attention mask output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.ops.slot_attention_kernel import (
    sa_iterations_pallas, sa_iterations_ref)


def _weights(rng, D, M):
    r = np.random.RandomState(rng)
    g = lambda *s: jnp.asarray(r.randn(*s) * 0.2, jnp.float32)
    return {
        "wq": g(D, D),
        "ln_q_scale": jnp.ones((D,)) * 1.1,
        "ln_q_bias": g(D) * 0.1,
        "gru_wi": g(D, 3 * D),
        "gru_bi": g(3 * D) * 0.1,
        "gru_wh": g(D, 3 * D),
        "gru_bh": g(3 * D) * 0.1,
        "ln_mlp_scale": jnp.ones((D,)) * 0.9,
        "ln_mlp_bias": g(D) * 0.1,
        "w1": g(D, M),
        "b1": g(M) * 0.1,
        "w2": g(M, D),
        "b2": g(D) * 0.1,
    }


@pytest.mark.parametrize("B,N,S,D,iters", [
    (2, 256, 5, 64, 2),    # S padded 5->8, two 128-tiles
    (1, 512, 8, 32, 3),    # multiple tiles, 3 iterations
])
def test_kernel_matches_ref(B, N, S, D, iters):
    M = 2 * D
    p = _weights(0, D, M)
    r = np.random.RandomState(1)
    k = jnp.asarray(r.randn(B, N, D), jnp.float32)
    v = jnp.asarray(r.randn(B, N, D), jnp.float32)
    slots = jnp.asarray(r.randn(B, S, D), jnp.float32)

    ref = sa_iterations_ref(k, v, slots, p, num_iterations=iters, eps=1e-6)
    for force_tiled in (False, True):
        out = sa_iterations_pallas(k, v, slots, p, num_iterations=iters,
                                   eps=1e-6, interpret=True,
                                   force_tiled=force_tiled,
                                   kv_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_kernel_mask_matches_ref():
    B, N, S, D, iters = 2, 256, 5, 64, 2
    p = _weights(3, D, 2 * D)
    r = np.random.RandomState(4)
    k = jnp.asarray(r.randn(B, N, D), jnp.float32)
    v = jnp.asarray(r.randn(B, N, D), jnp.float32)
    slots = jnp.asarray(r.randn(B, S, D), jnp.float32)

    ref_s, ref_m = sa_iterations_ref(
        k, v, slots, p, num_iterations=iters, eps=1e-6,
        return_last_attn=True)
    for force_tiled in (False, True):
        out_s, out_m = sa_iterations_pallas(
            k, v, slots, p, num_iterations=iters, eps=1e-6,
            return_last_attn=True, interpret=True, force_tiled=force_tiled,
            kv_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                                   rtol=2e-4, atol=2e-5)
        # masks are a valid softmax over slots at every position
        np.testing.assert_allclose(np.asarray(out_m).sum(1), 1.0, atol=1e-4)


def test_module_paths_share_params():
    """The flax module produces identical results via either backend."""
    from slotdiffusion_tpu.models.slot_attention import SlotAttention

    B, N, S, D = 2, 256, 4, 32
    mod_ref = SlotAttention(num_iterations=2, slot_size=D,
                            mlp_hidden_size=2 * D, use_pallas=False)
    r = np.random.RandomState(5)
    inputs = jnp.asarray(r.randn(B, N, 3 * D), jnp.float32)
    slots = jnp.asarray(r.randn(B, S, D), jnp.float32)
    variables = mod_ref.init(jax.random.PRNGKey(0), inputs, slots)
    out_ref = mod_ref.apply(variables, inputs, slots)

    # same variables drive the kernel path (interpret mode on CPU): pull
    # the raw weight dict out of the module params and call the kernel
    p = {k2: v2 for k2, v2 in variables["params"].items()
         if k2 not in ("ln_in_scale", "ln_in_bias", "wk", "wv")}
    x = np.asarray(inputs, np.float64)
    mu = x.mean(-1, keepdims=True)
    xn = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + 1e-6)
    xn = xn * np.asarray(variables["params"]["ln_in_scale"]) + \
        np.asarray(variables["params"]["ln_in_bias"])
    k = jnp.asarray(xn @ np.asarray(variables["params"]["wk"]), jnp.float32)
    v = jnp.asarray(xn @ np.asarray(variables["params"]["wv"]), jnp.float32)
    out_pallas = sa_iterations_pallas(
        k, v, slots, p, num_iterations=2, eps=1e-6, interpret=True,
        kv_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_ref),
                               rtol=5e-3, atol=5e-4)


def test_grad_flows_through_ref_path():
    B, N, S, D = 1, 128, 4, 32
    p = _weights(6, D, 2 * D)
    r = np.random.RandomState(7)
    k = jnp.asarray(r.randn(B, N, D), jnp.float32)
    v = jnp.asarray(r.randn(B, N, D), jnp.float32)
    slots = jnp.asarray(r.randn(B, S, D), jnp.float32)

    def loss(k, v, slots, p):
        out = sa_iterations_ref(k, v, slots, p, num_iterations=2, eps=1e-6)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(k, v, slots, p)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def test_kernel_bf16_kv_close_to_ref():
    """The default bf16 k/v streaming (XLA-default-precision analog) stays
    within bf16-level tolerance of the f32 reference."""
    B, N, S, D, iters = 2, 256, 5, 64, 2
    p = _weights(8, D, 2 * D)
    r = np.random.RandomState(9)
    k = jnp.asarray(r.randn(B, N, D), jnp.float32)
    v = jnp.asarray(r.randn(B, N, D), jnp.float32)
    slots = jnp.asarray(r.randn(B, S, D), jnp.float32)
    ref = sa_iterations_ref(k, v, slots, p, num_iterations=iters, eps=1e-6)
    out = sa_iterations_pallas(k, v, slots, p, num_iterations=iters,
                               eps=1e-6, interpret=True)
    err = float(jnp.abs(out - ref).max())
    assert err < 0.15, err
