"""Training-step attribution: fwd vs fwd+bwd vs fwd+bwd+adam.

Usage: python scripts/bench_train_breakdown.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from slotdiffusion_tpu.models.unet import UNetModel

    B, LATENT, SLOTS, SLOT_DIM = 32, (32, 32), 15, 192
    unet = UNetModel(
        in_channels=3, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8, 4, 2), dropout=0.0,
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        context_dim=SLOT_DIM, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (B, *LATENT, 3), jnp.float32)
    t = jax.random.randint(rng, (B,), 0, 1000)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape, jnp.float32)
    params = unet.init(jax.random.PRNGKey(1), x0, t, ctx)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def loss_fn(params, x):
        pred = unet.apply({"params": params}, x, t, ctx)
        return jnp.mean((pred - eps) ** 2)

    def make_chain(mode):
        @jax.jit
        def chain(params, opt_state, x, iters):
            def body(i, carry):
                params, opt_state, x = carry
                if mode == "fwd":
                    loss = loss_fn(params, x)
                elif mode == "grad":
                    loss, grads = jax.value_and_grad(loss_fn)(params, x)
                    loss = loss + sum(
                        jnp.sum(g[..., 0]).astype(jnp.float32) * 1e-20
                        for g in jax.tree_util.tree_leaves(grads)[:1])
                else:
                    loss, grads = jax.value_and_grad(loss_fn)(params, x)
                    updates, opt_state = tx.update(grads, opt_state,
                                                   params)
                    params = optax.apply_updates(params, updates)
                x = x + loss.astype(x.dtype) * 1e-12
                return params, opt_state, x

            out = jax.lax.fori_loop(0, iters, body,
                                    (params, opt_state, x))
            return out[2][0, 0, 0, 0]

        return chain

    for mode in ("fwd", "grad", "adam"):
        chain = make_chain(mode)
        float(chain(params, opt_state, x0, 1))
        float(chain(params, opt_state, x0, args.iters + 1))

        def best(n, tries=4):
            ts = []
            for _ in range(tries):
                t0 = time.perf_counter()
                float(chain(params, opt_state, x0, n))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (best(args.iters + 1) - best(1)) / args.iters
        print(f"{mode:<6} {per * 1e3:8.3f} ms/step {1.0 / per:8.1f} steps/s")


if __name__ == "__main__":
    main()

# CAVEAT (measured): the "fwd" and "grad" modes are DCE-contaminated —
# returning only one leaf lets XLA delete every unused per-leaf update
# and weight-grad computation (bench_adam.py's tree mode reports an
# impossible 0.064 ms for a 134M-param Adam update the same way). Only
# the full "adam" mode measures a real train step. Kept for the record.
