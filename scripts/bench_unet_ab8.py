"""Full-UNet A/B, batch 8: softmax traffic + skip-concat bounds.

- div_after: unnormalized exp goes straight into the value matmul and the
  row-sum divides the [N, HD] OUTPUT instead of the [H, N, N] weights —
  the normalized-weights tensor is never materialized and the divide
  touches N*HD instead of H*N*N elements.
- bf16_logits (BOUND ONLY, not for adoption): softmax entirely in bf16 —
  measures the remaining f32-logits HBM traffic on the table.
- no_skip (BOUND ONLY): up-path ResBlocks consume h alone (same channel
  count via a 1x1 of the skip added AFTER conv1) — approximates removing
  the concat materialization while keeping conv1 shapes MXU-identical.

Usage: python scripts/bench_unet_ab8.py [--iters 50]
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

    from slotdiffusion_tpu.models import unet as um

    orig_attn = um._attention

    def attn_div_after(q, k, v, num_heads, dtype, backend="einsum",
                       softmax="fast"):
        B, Nq, HD = q.shape
        Nk = k.shape[1]
        D = HD // num_heads
        q = q.reshape(B, Nq, num_heads, D)
        k = k.reshape(B, Nk, num_heads, D)
        v = v.reshape(B, Nk, num_heads, D)
        scale = D ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        e = jnp.exp(jnp.minimum(logits, 80.0))
        denom = jnp.sum(e, axis=-1)  # [B, H, Nq]
        out = jnp.einsum("bhqk,bkhd->bqhd", e.astype(dtype), v,
                         preferred_element_type=jnp.float32)
        out = out / (denom.transpose(0, 2, 1)[..., None] + 1e-30)
        return out.astype(dtype).reshape(B, Nq, HD)

    def attn_bf16(q, k, v, num_heads, dtype, backend="einsum",
                  softmax="fast"):
        B, Nq, HD = q.shape
        Nk = k.shape[1]
        D = HD // num_heads
        q = q.reshape(B, Nq, num_heads, D)
        k = k.reshape(B, Nk, num_heads, D)
        v = v.reshape(B, Nk, num_heads, D)
        scale = D ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        e = jnp.exp(jnp.minimum(logits, 80.0))
        w = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v)
        return out.astype(dtype).reshape(B, Nq, HD)

    results = {}
    results["baseline"] = time_unet(args.iters)
    for name, fn in (("div_after", attn_div_after),
                     ("bf16_logits", attn_bf16)):
        um._attention = fn
        try:
            results[name] = time_unet(args.iters)
        finally:
            um._attention = orig_attn

    base = results["baseline"]
    print(f"{'variant':<14} {'ms/step':>9} {'delta_us':>9} {'steps/s':>9}")
    for k, v in results.items():
        print(f"{k:<14} {v * 1e3:9.3f} {(base - v) * 1e6:9.1f} "
              f"{1.0 / v:9.1f}")


if __name__ == "__main__":
    main()
