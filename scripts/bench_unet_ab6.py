"""Full-UNet A/B, batch 6: fused q/k/v projection matmuls.

- fused_qkv_self: self-attention computes q,k,v with ONE [C, 3C] matmul
  and lane-aligned slices (C is a multiple of 128 at every level).
- fused_kv_cross: cross-attention computes k,v with ONE [192, 2C] matmul.
- both.

(Round 1 tried fused QKV and reverted; the fast-softmax change moved the
fusion landscape, so re-measure.)

Usage: python scripts/bench_unet_ab6.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def time_unet(iters, tries=5):
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
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)

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

    orig_cls = um.CrossAttention
    FUSE = {"self": False, "cross": False}

    class FusedCrossAttention(nn.Module):
        query_dim: int
        context_dim: object = None
        num_heads: int = 8
        head_dim: int = 64
        attn_backend: str = "einsum"
        attn_softmax: str = "fast"
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, context=None):
            inner = self.num_heads * self.head_dim
            is_self = context is None
            ctx = x if is_self else context
            if is_self and FUSE["self"]:
                qkv = nn.Dense(3 * inner, use_bias=False,
                               dtype=self.dtype, name="to_qkv")(x)
                q = jax.lax.slice_in_dim(qkv, 0, inner, axis=-1)
                k = jax.lax.slice_in_dim(qkv, inner, 2 * inner, axis=-1)
                v = jax.lax.slice_in_dim(qkv, 2 * inner, 3 * inner,
                                         axis=-1)
            elif (not is_self) and FUSE["cross"]:
                q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                             name="to_q")(x)
                kv = nn.Dense(2 * inner, use_bias=False,
                              dtype=self.dtype, name="to_kv")(ctx)
                k = jax.lax.slice_in_dim(kv, 0, inner, axis=-1)
                v = jax.lax.slice_in_dim(kv, inner, 2 * inner, axis=-1)
            else:
                q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                             name="to_q")(x)
                k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                             name="to_k")(ctx)
                v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                             name="to_v")(ctx)
            out = um._attention(q, k, v, self.num_heads, self.dtype,
                                backend=self.attn_backend,
                                softmax=self.attn_softmax)
            return nn.Dense(self.query_dim, dtype=self.dtype,
                            name="to_out")(out)

    results = {}
    results["baseline"] = time_unet(args.iters)
    um.CrossAttention = FusedCrossAttention
    try:
        for name, (fs, fc) in (("fused_qkv_self", (True, False)),
                               ("fused_kv_cross", (False, True)),
                               ("both", (True, True))):
            FUSE["self"], FUSE["cross"] = fs, fc
            results[name] = time_unet(args.iters)
    finally:
        um.CrossAttention = orig_cls

    base = results["baseline"]
    print(f"{'variant':<16} {'ms/step':>9} {'delta_us':>9} {'steps/s':>9}")
    for k, v in results.items():
        print(f"{k:<16} {v * 1e3:9.3f} {(base - v) * 1e6:9.1f} "
              f"{1.0 / v:9.1f}")


if __name__ == "__main__":
    main()
