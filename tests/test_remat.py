"""The `use_checkpoint` (nn.remat) knob must be load-bearing: same params,
same forward, same gradients as the non-remat UNet — it only changes what
XLA rematerializes in the backward pass (the reference's analog is the
custom checkpoint autograd function, unet/utils.py:16-67, also default-off).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models.unet import UNetModel

pytestmark = pytest.mark.fast

_CFG = dict(
    in_channels=3,
    model_channels=16,
    out_channels=3,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    num_head_channels=8,
    context_dim=24,
    attn_softmax="stable",
)


def _data(rng):
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    t = np.array([3.0, 77.0], np.float32)
    ctx = rng.randn(2, 5, 24).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)


@pytest.mark.parametrize("resblock_updown", [False, True])
def test_remat_unet_forward_and_grads_match(rng, resblock_updown):
    base = UNetModel(use_checkpoint=False, resblock_updown=resblock_updown,
                     **_CFG)
    remat = UNetModel(use_checkpoint=True, resblock_updown=resblock_updown,
                      **_CFG)
    x, t, ctx = _data(rng)
    variables = base.init(jax.random.PRNGKey(0), x, t, ctx)
    # identical param trees: the remat transform must not change
    # names/shapes (a checkpoint saved without remat loads with it)
    v2 = remat.init(jax.random.PRNGKey(0), x, t, ctx)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    def loss(params, model):
        out = model.apply({"params": params}, x, t, ctx)
        return jnp.sum(out ** 2)

    f_base = jax.jit(lambda p: loss(p, base))
    f_remat = jax.jit(lambda p: loss(p, remat))
    np.testing.assert_allclose(f_remat(variables["params"]),
                               f_base(variables["params"]), rtol=1e-6)

    g_base = jax.jit(jax.grad(lambda p: loss(p, base)))(variables["params"])
    g_remat = jax.jit(jax.grad(lambda p: loss(p, remat)))(
        variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(g_base)
    flat_r = jax.tree_util.tree_leaves_with_path(g_remat)
    for (pb, lb), (pr, lr) in zip(flat_b, flat_r):
        assert pb == pr
        np.testing.assert_allclose(
            np.asarray(lr), np.asarray(lb), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(pb))
