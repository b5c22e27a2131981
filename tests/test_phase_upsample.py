"""Phase-conv upsample: exactness vs nearest2x + conv3x3.

The decoder's Upsample computes conv3x3(nearest2x(x)) as four 2x2 phase
convs (models/unet.py:_PhaseUpConv). These tests pin the rewrite to the
direct formulation bit-for-bit-level (f32 matmul precision) using the
SAME parameter tree, including borders and non-square inputs.
"""

import jax
import jax.numpy as jnp
import pytest

from slotdiffusion_tpu.models import unet as um

pytestmark = pytest.mark.fast


def _direct_upsample(x, variables):
    u = um._upsample2x(x)
    W = variables["params"]["Conv_0"]["kernel"]
    b = variables["params"]["Conv_0"]["bias"]
    dn = jax.lax.conv_dimension_numbers(
        u.shape, W.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        u, W, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b


@pytest.mark.parametrize("shape", [(2, 4, 4, 8), (1, 5, 3, 8),
                                   (2, 8, 8, 16)])
def test_phase_upsample_matches_direct(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    mod = um.Upsample(shape[-1], dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), x)
    with jax.default_matmul_precision("float32"):
        y = mod.apply(variables, x)
        y_ref = _direct_upsample(x, variables)
    assert y.shape == y_ref.shape
    assert float(jnp.max(jnp.abs(y - y_ref))) < 1e-5 * float(
        jnp.max(jnp.abs(y_ref)) + 1.0)


def test_phase_upsample_no_conv_is_nearest():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    mod = um.Upsample(8, use_conv=False)
    y = mod.apply({"params": {}}, x)
    assert (y == um._upsample2x(x)).all()


def test_conv_out_bf16_acc_matches_f32_at_zero_init():
    """Zero-init conv_out: both compute paths output exactly bias (zeros)
    at init, and param trees are identical for checkpoint interchange."""
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    a = um._ConvOutBf16Acc(3)
    va = a.init(jax.random.PRNGKey(1), x)
    from flax import linen as nn
    ref = nn.Conv(3, (3, 3), kernel_init=um.zero_init, dtype=jnp.float32)
    vr = ref.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(va) == \
        jax.tree_util.tree_structure(vr)
    for pa, pr in zip(jax.tree_util.tree_leaves(va),
                      jax.tree_util.tree_leaves(vr)):
        assert pa.shape == pr.shape
    np.testing.assert_allclose(np.asarray(a.apply(va, x)), 0.0)


def test_conv_out_bf16_acc_close_to_f32_conv():
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 8))
    a = um._ConvOutBf16Acc(3)
    va = a.init(jax.random.PRNGKey(1), x)
    k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 3)) * 0.1
    va = {"params": {"kernel": k, "bias": va["params"]["bias"]}}
    from flax import linen as nn
    ref = nn.Conv(3, (3, 3), dtype=jnp.float32)
    y_bf = np.asarray(a.apply(va, x))
    y_f32 = np.asarray(ref.apply(va, x))
    np.testing.assert_allclose(y_bf, y_f32, atol=0.05, rtol=0.05)

def test_conv_out_bf16_acc_is_differentiable():
    """The bf16-operand/f32-accumulate conv_out must be trainable with f32
    master weights: JAX's conv transpose rejects the mixed (f32 cotangent,
    bf16 operand) pair `preferred_element_type=f32` yields under AD, so a
    custom_vjp supplies the torch-AMP backward (grad convs in bf16).
    Checks grads exist, are f32, nonzero, and match an all-f32 conv's
    grads to bf16 rounding tolerance."""
    import numpy as np
    from flax import linen as nn

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 8))
    g_out = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 3))
    a = um._ConvOutBf16Acc(3)
    k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 3)) * 0.1
    va = {"params": {"kernel": k, "bias": jnp.zeros((3,))}}

    def loss_a(v, xx):
        return jnp.sum(a.apply(v, xx) * g_out)

    (dva, dx) = jax.grad(loss_a, argnums=(0, 1))(va, x)
    ref = nn.Conv(3, (3, 3), dtype=jnp.float32)

    def loss_r(v, xx):
        return jnp.sum(ref.apply(v, xx) * g_out)

    (dvr, dxr) = jax.grad(loss_r, argnums=(0, 1))(va, x)
    dk = dva["params"]["kernel"]
    assert dk.dtype == jnp.float32 and bool(jnp.any(dk != 0))
    np.testing.assert_allclose(np.asarray(dk),
                               np.asarray(dvr["params"]["kernel"]),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dxr),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(dva["params"]["bias"]),
                               np.asarray(dvr["params"]["bias"]),
                               atol=1e-4, rtol=1e-4)
