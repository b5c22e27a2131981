"""split-skip decoder: exactness vs the concat formulation.

`UNetModel(split_skip=True)` computes decoder concat ResBlocks on
(h, skip) pairs — GroupNorm stats from per-channel moments, consuming
convs slice their kernels (models/unet.py:ResBlock, blocks.py:
GroupNorm32._split_call). These tests pin (a) param-tree identity with
the concat path, (b) forward equality under f32 matmul precision, and
(c) the tuple GroupNorm against the direct concat GroupNorm across
group/channel-split alignments (including splits that straddle group
boundaries, e.g. 256+128 with 32 groups).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotdiffusion_tpu.models import unet as um
from slotdiffusion_tpu.models.blocks import GroupNorm32

pytestmark = pytest.mark.fast


def _randomize(variables, scale=0.02):
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("ca,cb", [(8, 8), (16, 8), (24, 8)])
def test_tuple_groupnorm_matches_concat(ca, cb):
    # 8 groups over ca+cb channels; (24, 8) puts a group boundary inside
    # the first part (32 channels / 8 groups = 4-wide groups)
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, ca))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, cb)) * 2.0
    gn = GroupNorm32(num_groups=8, act="silu", dtype=jnp.float32)
    xc = jnp.concatenate([a, b], axis=-1)
    v = gn.init(jax.random.PRNGKey(2), xc)
    v = _randomize(v, 0.3)
    y_ref = gn.apply(v, xc)
    ya, yb = gn.apply(v, (a, b))
    y_split = jnp.concatenate([ya, yb], axis=-1)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_split_skip_unet_matches_concat():
    kw = dict(in_channels=3, model_channels=16, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_head_channels=8, context_dim=24,
              dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.full((2,), 5, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 24))
    m0 = um.UNetModel(split_skip=False, **kw)
    m1 = um.UNetModel(split_skip=True, **kw)
    v = m0.init(jax.random.PRNGKey(1), x, t, ctx)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(1),
                                             x, t, ctx))
    v = _randomize(v)
    with jax.default_matmul_precision("float32"):
        y0 = m0.apply(v, x, t, ctx)
        y1 = m1.apply(v, x, t, ctx)
    scale = float(jnp.max(jnp.abs(y0)))
    assert scale > 0
    assert float(jnp.max(jnp.abs(y0 - y1))) < 2e-5 * scale


def test_split_skip_grads_flow():
    kw = dict(in_channels=3, model_channels=16, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_head_channels=8, context_dim=24,
              dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.full((2,), 5, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 24))
    m = um.UNetModel(split_skip=True, **kw)
    v = _randomize(m.init(jax.random.PRNGKey(1), x, t, ctx))

    def loss(params):
        return jnp.sum(m.apply(params, x, t, ctx) ** 2)

    g = jax.grad(loss)(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # the sliced skip-half of the first decoder conv gets gradient
    up_conv = g["params"]["up1_res0"]["Conv_0"]["kernel"]
    assert float(jnp.abs(up_conv).sum()) > 0
