"""Full-UNet A/B, batch 12: per-jit compiler_options through the tunnel.

Env XLA_FLAGS is rejected client-side on the axon tunnel (the compiler
runs server-side), but `jax.jit(..., compiler_options=...)` ships the
options inside the compile request. Sweeps scoped-VMEM and scheduler
options; options the server rejects are reported as FAILED.

Usage: python scripts/bench_unet_ab12.py [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

SWEEPS = {
    "baseline": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "async_fusion": {"xla_tpu_enable_async_collective_fusion": "true"},
}


def time_unet(iters, tries=5, compiler_options=None):
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

    def chain_fn(params, x, t, ctx, iters):
        def body(i, x):
            eps = unet.apply({"params": params}, x, t, ctx)
            return eps.astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0, 0]

    if compiler_options:
        chain = jax.jit(chain_fn, compiler_options=compiler_options)
    else:
        chain = jax.jit(chain_fn)

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

    base = None
    for name, opts in SWEEPS.items():
        try:
            v = time_unet(args.iters, compiler_options=opts)
        except Exception as e:  # server-side rejection
            print(f"{name:<14} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}")
            continue
        if base is None:
            base = v
        print(f"{name:<14} {v * 1e3:9.3f} ms {(base - v) * 1e6:9.1f} us "
              f"{1.0 / v:9.1f} steps/s")


if __name__ == "__main__":
    main()
