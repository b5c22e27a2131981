"""Full-UNet A/B, batch 2: lowering details (single TPU chip).

Variants (monkeypatched, exact bench.py model otherwise):
- upsample_bcast: nearest-2x via reshape+broadcast instead of
  jax.image.resize (resize can lower to gather)
- geglu_2dense: GEGLU as two half-width Dense ops instead of one Dense +
  jnp.split (split can force a relayout copy)
- convout_bf16: final conv in bf16 with f32 accumulation instead of f32

Usage: python scripts/bench_unet_ab2.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def time_current(iters, tries=5):
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
    from flax import linen as nn

    from slotdiffusion_tpu.models import unet as um

    results = {}
    results["baseline"] = time_current(args.iters)

    # V1: nearest upsample via broadcast
    orig_up = um._upsample2x

    def up_bcast(x):
        B, H, W, C = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, 2, W, 2, C))
        return x.reshape(B, 2 * H, 2 * W, C)

    um._upsample2x = up_bcast
    try:
        results["upsample_bcast"] = time_current(args.iters)
    finally:
        um._upsample2x = orig_up

    # V2: GEGLU via two Dense
    class GEGLU2(nn.Module):
        out_dim: int
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            h = nn.Dense(self.out_dim * 2, dtype=self.dtype)(x)
            a = jax.lax.slice_in_dim(h, 0, self.out_dim, axis=-1)
            g = jax.lax.slice_in_dim(h, self.out_dim, 2 * self.out_dim,
                                     axis=-1)
            return a * nn.gelu(g)

    orig_geglu = um.GEGLU
    um.GEGLU = GEGLU2
    try:
        results["geglu_slice"] = time_current(args.iters)
    finally:
        um.GEGLU = orig_geglu

    base = results["baseline"]
    print(f"{'variant':<16} {'ms/step':>9} {'delta_us':>9} {'steps/s':>9}")
    for k, v in results.items():
        print(f"{k:<16} {v * 1e3:9.3f} {(base - v) * 1e6:9.1f} "
              f"{1.0 / v:9.1f}")


if __name__ == "__main__":
    main()
