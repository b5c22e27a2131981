"""Remat (activation checkpointing) sizing probe + A/B drive.

Finds where gradient rematerialization actually BUYS memory on one v5e
chip: compiles the flagship-style UNet train step (fwd+bwd+Adam) at a
given scale with `use_checkpoint` on/off and reports XLA's own
`memory_analysis()` temp bytes (compile-only, nothing executes), or —
with `--run` — executes timed steps and reports the device high-water
(`memory_stats()["peak_bytes_in_use"]`) plus steps/s, i.e. the real
memory-for-FLOPs trade (reference analog: the torch checkpoint wrapper,
/root/reference/slotdiffusion/video_based/models/unet/utils.py:16-67).

Usage:
    python scripts/bench_remat.py --bs 64 --latent 64 --ch 192   # compile
    python scripts/bench_remat.py --bs 64 --latent 64 --ch 192 --run
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--latent", type=int, default=64,
                   help="latent grid (64 = res-256 images at VQ f4)")
    p.add_argument("--ch", type=int, default=192, help="model_channels")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--run", action="store_true",
                   help="execute timed steps + device high-water instead "
                        "of compile-only memory analysis")
    p.add_argument("--remat", choices=["on", "off", "both"], default="both")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from slotdiffusion_tpu.models.unet import UNetModel

    B, L = args.bs, (args.latent, args.latent)
    SLOTS, SLOT_DIM = 15, 192

    def build(remat):
        return UNetModel(
            in_channels=3, model_channels=args.ch, out_channels=3,
            num_res_blocks=2, attention_resolutions=(8, 4, 2), dropout=0.0,
            channel_mult=(1, 2, 3, 4), num_head_channels=32,
            context_dim=SLOT_DIM, use_checkpoint=remat, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (B, *L, 3), jnp.float32)
    t = jax.random.randint(rng, (B,), 0, 1000)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape, jnp.float32)
    tx = optax.adam(1e-4)

    variants = {"on": [True], "off": [False],
                "both": [False, True]}[args.remat]
    rows = []
    params = None
    for remat in variants:
        unet = build(remat)
        if params is None:
            # remat does not change the param tree (tests/test_remat.py)
            params = unet.init(jax.random.PRNGKey(1), x0, t, ctx)["params"]
            opt_state = tx.init(params)

        def loss_fn(p, x, e):
            pred = unet.apply({"params": p}, x, t, ctx)
            return jnp.mean((pred - e) ** 2)

        @jax.jit
        def train_chain(params, opt_state, x, eps, iters):
            def body(i, carry):
                params, opt_state, x = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, x, eps)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                x = x + loss.astype(x.dtype) * 1e-12
                return params, opt_state, x

            params, opt_state, x = jax.lax.fori_loop(
                0, iters, body, (params, opt_state, x))
            return x[0, 0, 0, 0]

        row = dict(remat=remat, bs=B, latent=args.latent, ch=args.ch)
        if not args.run:
            lowered = train_chain.lower(params, opt_state, x0, eps, 1)
            try:
                ma = lowered.compile().memory_analysis()
            except Exception as e:  # compile-time HBM OOM is a result
                row.update(status=f"compile OOM: {type(e).__name__}",
                           detail=str(e).split("\n")[0][:200])
                rows.append(row)
                print(json.dumps(row), flush=True)
                continue
            row.update(
                temp_gb=round(ma.temp_size_in_bytes / 1024**3, 3),
                arg_gb=round(ma.argument_size_in_bytes / 1024**3, 3))
        else:
            dev = jax.local_devices()[0]
            try:
                float(train_chain(params, opt_state, x0, eps, 1))
            except Exception as e:  # OOM is a *result* here, not a failure
                row.update(status=f"OOM: {type(e).__name__}",
                           detail=str(e).split("\n")[0][:200])
                rows.append(row)
                print(json.dumps(row), flush=True)
                continue
            float(train_chain(params, opt_state, x0, eps, args.iters + 1))

            def best(n, tries=3):
                ts = []
                for _ in range(tries):
                    t0 = time.perf_counter()
                    float(train_chain(params, opt_state, x0, eps, n))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            per = (best(args.iters + 1) - best(1)) / args.iters
            stats = dev.memory_stats() or {}
            row.update(
                steps_per_sec=round(1.0 / per, 3),
                ms_per_step=round(per * 1e3, 2),
                peak_gb=round(stats.get("peak_bytes_in_use", 0) / 1024**3,
                              3),
                status="ok")
        rows.append(row)
        print(json.dumps(row), flush=True)

    return rows


if __name__ == "__main__":
    main()
