"""Exponential moving average of parameters.

Functional JAX equivalent of the reference's `LitEma`
(video_based/models/ddpm/ema.py:5-81): shadow copies updated as
    decay_t = min(decay, (1 + n) / (10 + n))         # warmup (ema.py:29-36)
    shadow = shadow - decay_t * (shadow - param)
with store/copy_to/restore replaced by pure functions over the param tree.

The EMA may be restricted to a parameter subtree (the reference only tracks
the diffusion decoder's UNet, ddpm.py:57-60); leaves outside the filter stay
tied to the live params.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


def _path_str(path):
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


class ExponentialMovingAverage(struct.PyTreeNode):
    shadow: dict
    num_updates: jnp.ndarray  # int32 scalar
    decay: float = struct.field(pytree_node=False, default=0.9999)
    use_num_updates: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, params, decay=0.9999, use_num_updates=True):
        # jnp.copy (not asarray): the shadow must NOT alias the live params —
        # the jitted train step donates its TrainState, and two pytree leaves
        # sharing one buffer trip XLA's "donate the same buffer twice" check.
        return cls(
            shadow=jax.tree_util.tree_map(jnp.copy, params),
            num_updates=jnp.zeros((), jnp.int32),
            decay=decay,
            use_num_updates=use_num_updates,
        )

    def update(self, params):
        n = self.num_updates + 1
        if self.use_num_updates:
            decay = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        else:
            decay = jnp.asarray(self.decay)
        one_minus = 1.0 - decay
        new_shadow = jax.tree_util.tree_map(
            lambda s, p: s - one_minus * (s - p.astype(s.dtype)),
            self.shadow, params)
        return self.replace(shadow=new_shadow, num_updates=n)


def swap_ema_params(params, ema: ExponentialMovingAverage,
                    filter_fn: Optional[Callable[[str], bool]] = None):
    """Return params with EMA shadows substituted (the `ema_scope` analog,
    ddpm.py:133-147). With a filter, only matching paths are swapped."""
    if filter_fn is None:
        return ema.shadow
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(ema.shadow)
    treedef = jax.tree_util.tree_structure(params)
    out = [
        s if filter_fn(_path_str(path)) else p
        for (path, p), s in zip(flat_p, flat_s)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)
