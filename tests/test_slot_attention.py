import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models.slot_attention import SlotAttention

pytestmark = pytest.mark.fast


def _make(return_last_attn=False, num_iterations=2):
    return SlotAttention(
        num_iterations=num_iterations,
        slot_size=64,
        mlp_hidden_size=128,
        return_last_attn=return_last_attn,
    )


def test_shapes_and_determinism():
    B, N, C, S, D = 2, 49, 32, 5, 64
    mod = _make()
    key = jax.random.PRNGKey(0)
    inputs = jax.random.normal(key, (B, N, C))
    slots0 = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
    params = mod.init(jax.random.PRNGKey(2), inputs, slots0)
    out1 = mod.apply(params, inputs, slots0)
    out2 = mod.apply(params, inputs, slots0)
    assert out1.shape == (B, S, D)
    np.testing.assert_allclose(out1, out2)


def test_wmask_returns_softmax_over_slots():
    B, N, C, S, D = 2, 16, 32, 4, 64
    mod = _make(return_last_attn=True)
    inputs = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    slots0 = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
    params = mod.init(jax.random.PRNGKey(2), inputs, slots0)
    slots, masks = mod.apply(params, inputs, slots0)
    assert slots.shape == (B, S, D)
    assert masks.shape == (B, S, N)
    # mask is a softmax over slots -> sums to 1 over the slot dim
    np.testing.assert_allclose(np.asarray(masks).sum(1), 1.0, atol=1e-5)


def test_matches_manual_reference_math():
    """One iteration of SA must equal a hand-computed numpy reference of the
    math at reference slot_attention.py:78-102, using the module's raw
    parameter layout (shared by the jnp and Pallas backends)."""
    B, N, C, S, D = 1, 8, 16, 3, 32
    mod = SlotAttention(num_iterations=1, slot_size=D, mlp_hidden_size=64,
                        use_pallas=False)
    inputs = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    slots0 = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
    variables = mod.init(jax.random.PRNGKey(2), inputs, slots0)
    out = np.asarray(mod.apply(variables, inputs, slots0))

    p = {k: np.asarray(v) for k, v in variables["params"].items()}

    def ln(x, scale, bias, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * scale + bias

    x = ln(np.asarray(inputs), p["ln_in_scale"], p["ln_in_bias"])
    k = x @ p["wk"]
    v = x @ p["wv"]
    q = ln(np.asarray(slots0), p["ln_q_scale"], p["ln_q_bias"]) @ p["wq"]
    logits = (D ** -0.5) * np.einsum("bnd,bsd->bns", k, q)
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    attn = attn + 1e-6
    attn = attn / attn.sum(1, keepdims=True)
    updates = np.einsum("bns,bnd->bsd", attn, v)

    # flax GRUCell math: packed kernels (r | z | n), input kernels
    # bias-free, hidden kernels biased, new-gate hidden term r-scaled
    i = updates.reshape(B * S, D)
    h = np.asarray(slots0).reshape(B * S, D)

    def sigmoid(a):
        return 1.0 / (1.0 + np.exp(-a))

    gi = i @ p["gru_wi"]
    gh = h @ p["gru_wh"] + p["gru_bh"]
    r = sigmoid(gi[:, :D] + gh[:, :D])
    z = sigmoid(gi[:, D:2 * D] + gh[:, D:2 * D])
    n = np.tanh(gi[:, 2 * D:] + r * gh[:, 2 * D:])
    new_h = (1.0 - z) * n + z * h
    slots = new_h.reshape(B, S, D)
    y = ln(slots, p["ln_mlp_scale"], p["ln_mlp_bias"])
    y = np.maximum(y @ p["w1"] + p["b1"], 0.0)
    y = y @ p["w2"] + p["b2"]
    expected = slots + y

    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_jit_and_grad():
    B, N, C, S, D = 2, 16, 32, 4, 64
    mod = _make()
    inputs = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
    slots0 = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
    params = mod.init(jax.random.PRNGKey(2), inputs, slots0)

    @jax.jit
    def loss_fn(params, inputs, slots0):
        out = mod.apply(params, inputs, slots0)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params, inputs, slots0)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
