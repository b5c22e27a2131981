"""Full-UNet A/B of optimization knobs (single TPU chip).

Times the exact bench.py UNet with combinations of the fused-GN Pallas
kernel and attention backends — the decisive in-context measurement
(micro-benchmarks at these operand sizes are noise-dominated).

Usage: python scripts/bench_unet_ab.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def time_unet(fused_gn, attn_backend, iters, tries=5):
    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.models.unet import UNetModel

    B, LATENT, SLOTS, SLOT_DIM = 32, (32, 32), 15, 192
    unet = UNetModel(
        in_channels=3, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8, 4, 2), dropout=0.0,
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        context_dim=SLOT_DIM, attn_backend=attn_backend,
        fused_gn=fused_gn, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, *LATENT, 3), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    params = unet.init(jax.random.PRNGKey(1), x, t, ctx)["params"]

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

    variants = [
        (False, "einsum"),  # round-1 baseline
        (True, "einsum"),   # + fused GN
        (False, "auto"),    # + per-resolution attention backend
        (True, "auto"),     # both
        (True, "dpa"),      # dpa everywhere for reference
    ]
    print(f"{'fused_gn':<9} {'backend':<8} {'ms/step':>9} {'steps/s':>9}")
    for fused, backend in variants:
        t = time_unet(fused, backend, args.iters)
        print(f"{str(fused):<9} {backend:<8} {t * 1e3:9.3f} "
              f"{1.0 / t:9.1f}")


if __name__ == "__main__":
    main()
