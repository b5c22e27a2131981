"""Optimizer-update micro-bench: per-leaf optax.adam vs flat-vector adam.

The full train step showed +10.6 ms going from fwd+bwd to
fwd+bwd+adam (bench_train_breakdown.py) for a ~30M-param tree — ~12x
the raw HBM traffic of the update. Hypothesis: hundreds of small
per-leaf fusions. This times the update alone on the same tree, and a
flattened single-vector formulation (one ravel/unravel copy pair per
step) as the candidate fix.

Usage: python scripts/bench_adam.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from slotdiffusion_tpu.models.unet import UNetModel

    B, LATENT, SLOTS, SLOT_DIM = 32, (32, 32), 15, 192
    unet = UNetModel(
        in_channels=3, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8, 4, 2), dropout=0.0,
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        context_dim=SLOT_DIM, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *LATENT, 3))
    t = jnp.full((2,), 1, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, SLOTS, SLOT_DIM))
    params = unet.init(jax.random.PRNGKey(1), x, t, ctx)["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"tree: {n_leaves} leaves, {n_params/1e6:.1f}M params")

    grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) * 1e-4, params)

    def timer(chain, *state):
        float(chain(*state, 1))
        float(chain(*state, args.iters + 1))

        def best(n, tries=4):
            ts = []
            for _ in range(tries):
                t0 = time.perf_counter()
                float(chain(*state, n))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(args.iters + 1) - best(1)) / args.iters

    # per-leaf optax.adam
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def chain_tree(params, opt_state, grads, iters):
        def body(i, carry):
            params, opt_state = carry
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        params, _ = jax.lax.fori_loop(0, iters, body,
                                      (params, opt_state))
        return jax.tree_util.tree_leaves(params)[0].reshape(-1)[0]

    t_tree = timer(chain_tree, params, opt_state, grads)
    print(f"optax.adam (tree): {t_tree*1e3:8.3f} ms/step")

    # flat-vector adam (ravel grads, update flat buffers, unravel update)
    flat_params, unravel = ravel_pytree(params)
    flat_grads, _ = ravel_pytree(grads)
    m = jnp.zeros_like(flat_params)
    v = jnp.zeros_like(flat_params)

    @jax.jit
    def chain_flat(params, m, v, grads, iters):
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4

        def body(i, carry):
            p, m, v = carry
            g = grads
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            cnt = (i + 1).astype(jnp.float32)
            mh = m / (1 - b1 ** cnt)
            vh = v / (1 - b2 ** cnt)
            p = p - lr * mh / (jnp.sqrt(vh) + eps)
            return p, m, v

        p, m, v = jax.lax.fori_loop(0, iters, body, (params, m, v))
        return p[0]

    t_flat = timer(chain_flat, flat_params, m, v, flat_grads)
    print(f"flat adam:         {t_flat*1e3:8.3f} ms/step")

    # flat adam including the per-step ravel/unravel copies a real
    # train step would pay to keep model params structured
    @jax.jit
    def chain_flat_roundtrip(params, m, v, grads, iters):
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-4

        def body(i, carry):
            p_tree, m, v = carry
            g, _ = ravel_pytree(jax.tree_util.tree_map(
                lambda x: x, grads))
            p, _ = ravel_pytree(p_tree)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            cnt = (i + 1).astype(jnp.float32)
            mh = m / (1 - b1 ** cnt)
            vh = v / (1 - b2 ** cnt)
            p = p - lr * mh / (jnp.sqrt(vh) + eps)
            return unravel(p), m, v

        p_tree, m, v = jax.lax.fori_loop(0, iters, body,
                                         (params, m, v))
        return jax.tree_util.tree_leaves(p_tree)[0].reshape(-1)[0]

    t_rt = timer(chain_flat_roundtrip, params, m, v, grads)
    print(f"flat adam +ravel:  {t_rt*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
