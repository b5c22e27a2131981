"""UNet denoise-step time attribution (single TPU chip).

Times the flagship bench UNet (bench.py shapes) with individual subsystems
ablated to identity, using the tunnel-safe fori_loop+fetch methodology.
The deltas bound how much a targeted optimization (fused GN kernel,
skip-concat avoidance, attention relayout) can possibly win.

Usage: python scripts/bench_unet_breakdown.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def time_unet(make_unet, iters=50, tries=4):
    import jax
    import jax.numpy as jnp

    B, LATENT, SLOTS, SLOT_DIM = 32, (32, 32), 15, 192
    unet = make_unet(SLOT_DIM)
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

    per_step = (best(iters + 1) - best(1)) / iters
    return per_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    args = parser.parse_args()

    import jax.numpy as jnp
    from flax import linen as nn

    from slotdiffusion_tpu.models import unet as unet_mod
    from slotdiffusion_tpu.models import blocks as blocks_mod

    def make(SLOT_DIM, attn_res=(8, 4, 2), ctx=True):
        return unet_mod.UNetModel(
            in_channels=3, model_channels=128, out_channels=3,
            num_res_blocks=2, attention_resolutions=attn_res,
            dropout=0.0, channel_mult=(1, 2, 3, 4), num_head_channels=32,
            context_dim=SLOT_DIM if ctx else None, dtype=jnp.bfloat16)

    results = {}
    results["baseline"] = time_unet(lambda d: make(d), args.iters)

    # no attention blocks at all
    results["no_attention"] = time_unet(
        lambda d: make(d, attn_res=()), args.iters)

    # GroupNorm -> identity (keeps convs/attention; isolates GN cost)
    class _IdNorm(nn.Module):
        num_groups: int = 32
        epsilon: float = 1e-5
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            return x

    orig_gn_unet = unet_mod.GroupNorm32
    orig_gn_blocks = blocks_mod.GroupNorm32
    unet_mod.GroupNorm32 = _IdNorm
    blocks_mod.GroupNorm32 = _IdNorm
    try:
        results["no_groupnorm"] = time_unet(lambda d: make(d), args.iters)
    finally:
        unet_mod.GroupNorm32 = orig_gn_unet
        blocks_mod.GroupNorm32 = orig_gn_blocks

    # silu -> identity
    orig_silu = nn.silu
    nn.silu = lambda x: x
    try:
        results["no_silu"] = time_unet(lambda d: make(d), args.iters)
    finally:
        nn.silu = orig_silu

    base = results["baseline"]
    print(f"{'variant':<16} {'ms/step':>9} {'delta_us':>9} {'steps/s':>9}")
    for k, v in results.items():
        print(f"{k:<16} {v * 1e3:9.3f} {(base - v) * 1e6:9.1f} "
              f"{1.0 / v:9.1f}")


if __name__ == "__main__":
    main()
