"""Training-step benchmark: flagship UNet denoise training throughput.

The dominant training cost of SlotDiffusion stage-2 is the LDM denoise
objective: UNet forward + backward + Adam update. The reference repo
publishes no training throughput (BASELINE.md); this records ours.
bs 32, 32x32x3 latents, bf16 compute with f32 master weights,
fori_loop+scalar-fetch methodology (see bench.py).

Usage: python scripts/bench_train_step.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--optimizer", default="optax",
                        choices=["optax", "fused", "adam_bf16"],
                        help="optax.adam vs training.optim.fused_adam "
                             "(identical math, single per-leaf kernel)")
    parser.add_argument("--mode", default="full",
                        choices=["full", "fwdbwd"],
                        help="fwdbwd skips the optimizer (grads folded "
                             "into the carry so nothing is DCE'd) — the "
                             "difference to full attributes the Adam cost")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from slotdiffusion_tpu.models.unet import UNetModel
    from slotdiffusion_tpu.training.optim import fused_adam

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
    if args.optimizer == "fused":
        tx = fused_adam(1e-4)
    elif args.optimizer == "adam_bf16":
        # memory-lean variant (training/optim.py): bf16 first moment
        # halves mu's HBM traffic in the update
        tx = optax.adam(1e-4, mu_dtype=jnp.bfloat16)
    else:
        tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def loss_fn(params, x, eps):
        pred = unet.apply({"params": params}, x, t, ctx)
        return jnp.mean((pred - eps) ** 2)

    @jax.jit
    def chain(params, opt_state, x, eps, iters):
        def body(i, carry):
            params, opt_state, x = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, x, eps)
            if args.mode == "fwdbwd":
                # consume every grad leaf without the optimizer: the
                # global norm feeds the carry, so backward stays live
                loss = loss + 1e-12 * optax.global_norm(grads)
            else:
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            # feed the loss back so no step is dead code
            x = x + loss.astype(x.dtype) * 1e-12
            return params, opt_state, x

        params, opt_state, x = jax.lax.fori_loop(
            0, iters, body, (params, opt_state, x))
        return x[0, 0, 0, 0]

    float(chain(params, opt_state, x0, eps, 1))
    float(chain(params, opt_state, x0, eps, args.iters + 1))

    def best(n, tries=4):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            float(chain(params, opt_state, x0, eps, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_step = (best(args.iters + 1) - best(1)) / args.iters
    print(json.dumps({
        "metric": "unet_denoise_train_steps_per_sec_bs32",
        "value": round(1.0 / per_step, 3),
        "unit": "steps/s",
        "ms_per_step": round(per_step * 1e3, 3),
        "optimizer": args.optimizer,
        "mode": args.mode,
    }))


if __name__ == "__main__":
    main()
