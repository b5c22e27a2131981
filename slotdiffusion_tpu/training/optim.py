"""Optimizer and LR schedule construction (optax).

Replaces the reference's Adam + `CosineAnnealingWarmupRestarts` setup
(img_based/method.py:64-85): a per-STEP schedule with linear warmup from
`min_lr` to `max_lr` over `warmup_steps`, then a single cosine decay back to
`min_lr` over the remaining steps. `max_lr` may differ per parameter group —
the reference trains the DM decoder at `dec_lr` and the rest at `lr`
(img_based/method.py:235-285); here groups are expressed as path-prefix
rules resolved with `optax.multi_transform`.
"""

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def fused_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    """Adam with the whole per-leaf update (mu, nu, bias-corrected step)
    emitted from ONE tree_map lambda.

    Numerically identical to `optax.adam` (same update formula,
    eps_root=0); the difference is op structure: optax chains
    scale_by_adam -> scale_by_learning_rate as separate tree traversals,
    which XLA must re-fuse across ~300 leaf boundaries. Producing each
    leaf's (update, mu', nu') from a single lambda guarantees one fused
    elementwise kernel per leaf — measured A/B in
    scripts/bench_train_step.py --optimizer fused.
    """
    sched = learning_rate if callable(learning_rate) \
        else (lambda _: learning_rate)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(grads, state, params=None):
        count = state.count + 1
        # optax indexes the LR schedule with the PRE-increment count
        # (scale_by_schedule: sched(0) on the first update) while bias
        # correction uses the post-increment count
        lr = sched(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, m, n):
            m2 = b1 * m + (1.0 - b1) * g
            n2 = b2 * n + (1.0 - b2) * (g * g)
            upd = -lr * (m2 / c1) / (jnp.sqrt(n2 / c2) + eps)
            return upd, m2, n2

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_n = treedef.flatten_up_to(state.nu)
        out = [leaf(g, m, n) for g, m, n in zip(flat_g, flat_m, flat_n)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, FusedAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def cosine_warmup_schedule(max_lr, total_steps, warmup_steps, min_lr=0.0):
    """Per-step cosine schedule with linear warmup.

    Semantics match `CosineAnnealingWarmupRestarts` with a single cycle of
    `total_steps` (reference img_based/method.py:77-85): lr ramps linearly
    min_lr -> max_lr during warmup, then cosine-decays max_lr -> min_lr.
    """
    total_steps = max(int(total_steps), 1)
    warmup_steps = int(warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr + (max_lr - min_lr) * step / max(warmup_steps, 1)
        denom = max(total_steps - warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        cos = min_lr + 0.5 * (max_lr - min_lr) * (
            1.0 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def _label_params(params, group_prefixes: Sequence[str]):
    """Label each param leaf by the first matching top-level path prefix."""

    def label(path, _):
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for i, prefix in enumerate(group_prefixes):
            if path_str.startswith(prefix) or f"/{prefix}/" in f"/{path_str}/":
                return f"group{i}"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params_tree,
    lr: float,
    total_steps: int,
    warmup_steps: int,
    min_lr: float = 0.0,
    weight_decay: float = 0.0,
    clip_grad: Optional[float] = None,
    grad_accum_steps: int = 1,
    lr_groups: Optional[Dict[str, float]] = None,
    optimizer: str = "adam",
):
    """Build the full optax gradient transformation.

    Args:
        params_tree: the model parameter pytree (for group labeling).
        lr: base max learning rate.
        lr_groups: optional {path_prefix: max_lr} overrides, e.g.
            {"dm_decoder": 2e-4} mirrors the reference's dual-LR optimizer
            (img_based/method.py:235-285).
        clip_grad: global-norm clip value (`params.clip_grad`,
            savi_ldm_movie_params-res128.py:21); None/<=0 disables.
        grad_accum_steps: wrapped with optax.MultiSteps when > 1
            (`params.grad_accum_steps`).

    Returns:
        (optax.GradientTransformation, schedule_fn) — schedule_fn maps step
        to the base-group lr for logging.
    """

    def make_opt(max_lr):
        sched = cosine_warmup_schedule(max_lr, total_steps, warmup_steps,
                                       min_lr)
        if optimizer.lower() == "adamw" or (weight_decay and
                                            weight_decay > 0):
            core = optax.adamw(sched, weight_decay=weight_decay or 0.0)
        elif optimizer.lower() == "adam_fused":
            core = fused_adam(sched)
        elif optimizer.lower() == "adam":
            core = optax.adam(sched)
        elif optimizer.lower() == "adam_bf16":
            # memory-lean Adam: bf16 first moment halves mu's HBM
            # footprint/traffic (nu stays f32 — it controls the
            # preconditioner scale and bf16's 8 mantissa bits visibly
            # perturb step sizes). Changes training numerics slightly —
            # opt-in, never the default (reference parity uses f32 Adam).
            core = optax.adam(sched, mu_dtype=jnp.bfloat16)
        elif optimizer.lower() == "adafactor":
            # factored second moments: O(rows+cols) state instead of
            # O(rows*cols) — the memory-scaling option for models whose
            # Adam state would not fit HBM. min_dim_size_to_factor=128
            # keeps small tensors (norms, biases) unfactored.
            core = optax.adafactor(
                sched, min_dim_size_to_factor=128, multiply_by_parameter_scale=False,
                clipping_threshold=None, momentum=0.9,
                dtype_momentum=jnp.bfloat16)
        elif optimizer.lower() == "sgd":
            core = optax.sgd(sched, momentum=0.9)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        return core

    if lr_groups:
        prefixes = list(lr_groups.keys())
        labels = _label_params(params_tree, prefixes)
        transforms = {"default": make_opt(lr)}
        for i, prefix in enumerate(prefixes):
            transforms[f"group{i}"] = make_opt(lr_groups[prefix])
        core = optax.multi_transform(transforms, labels)
    else:
        core = make_opt(lr)

    chain = []
    if clip_grad is not None and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(core)
    tx = optax.chain(*chain)
    if grad_accum_steps and grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    base_sched = cosine_warmup_schedule(lr, total_steps, warmup_steps, min_lr)
    return tx, base_sched
