"""Full-UNet A/B, batch 3: weight-cast hoisting + softmax variants.

- precast_bf16: params cast to bf16 once outside the denoise loop. If XLA
  does not hoist the per-use f32->bf16 weight casts out of the fori_loop,
  this saves ~a full f32 read of the weights every step (inference-time
  weights are static; training keeps f32 master weights regardless).
- softmax_nomax: attention softmax without the max-subtraction pass
  (logits are bounded by construction: bf16 inputs, D^-0.5 scaling), one
  fewer reduce+broadcast over the f32 logits.

Usage: python scripts/bench_unet_ab3.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def time_unet(precast, iters, tries=5):
    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.models.unet import UNetModel

    B, LATENT, SLOTS, SLOT_DIM = 32, (32, 32), 15, 192
    unet = UNetModel(
        in_channels=3, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8, 4, 2), dropout=0.0,
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        context_dim=SLOT_DIM, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, *LATENT, 3), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    params = unet.init(jax.random.PRNGKey(1), x, t, ctx)["params"]
    if precast:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32
            else p, params)

    @jax.jit
    def chain(params, x, t, ctx, iters):
        def body(i, x):
            eps = unet.apply({"params": params}, x, t, ctx)
            return eps.astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0, 0]

    float(chain(params, x, t, ctx, 1))
    float(chain(params, x, t, ctx, iters + 1))

    def best(n):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            float(chain(params, x, t, ctx, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(iters + 1) - best(1)) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.models import unet as um

    results = {}
    results["baseline"] = time_unet(False, args.iters)
    results["precast_bf16"] = time_unet(True, args.iters)

    # softmax without max-subtraction
    orig_softmax = jax.nn.softmax

    def softmax_nomax(x, axis=-1):
        e = jnp.exp(x)
        return e / jnp.sum(e, axis=axis, keepdims=True)

    jax.nn.softmax = softmax_nomax
    um.jax.nn.softmax = softmax_nomax
    try:
        results["softmax_nomax"] = time_unet(False, args.iters)
        results["both"] = time_unet(True, args.iters)
    finally:
        jax.nn.softmax = orig_softmax

    base = results["baseline"]
    print(f"{'variant':<16} {'ms/step':>9} {'delta_us':>9} {'steps/s':>9}")
    for k, v in results.items():
        print(f"{k:<16} {v * 1e3:9.3f} {(base - v) * 1e6:9.1f} "
              f"{1.0 / v:9.1f}")


if __name__ == "__main__":
    main()
