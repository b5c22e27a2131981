"""First-class sampling benchmark: DPM-Solver++ decoded imgs/sec.

Flagship-scale slot-conditioned LDM decode (the eval-time hot path,
reference cond_ddpm.py:134-212 dispatch at steps=max(20, T/50)):
128x128 images via 32x32x3 VQ latents, 20 DPM-Solver++ steps order 3,
quantize-as-denoise correction, VQ-VAE decode, bs 16, bf16, one v5e
chip. Same fori_loop+scalar-fetch timing methodology as bench.py.

Usage: python scripts/bench_sampling.py [--bs 16] [--iters 5]
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
    parser.add_argument("--bs", type=int, default=16)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.configs_base import ldm_dec_dict
    from slotdiffusion_tpu.models.slot_diffusion import _build_dm_decoder

    SLOTS, SLOT_DIM = 15, 192
    B = args.bs
    dd = ldm_dec_dict((128, 128), SLOT_DIM)
    model = _build_dm_decoder(dd, jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (B, 128, 128, 3), jnp.float32)
    cond = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "diffusion": rng},
        img, cond, method=model.loss_function)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables["params"])

    @jax.jit
    def chain(params, rng, cond, iters):
        def body(i, acc):
            imgs = model.apply(
                {"params": params},
                rngs={"diffusion": jax.random.fold_in(rng, i)},
                method=lambda m: m.decode_latent(
                    m.generate_imgs(jax.random.fold_in(rng, i), cond=cond,
                                    use_dpm=True)))
            return acc + imgs[0, 0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chain(params, rng, cond, 1))
    float(chain(params, rng, cond, args.iters + 1))

    def best(n, tries=4):
        ts = []
        for _ in range(tries):
            t0 = time.perf_counter()
            float(chain(params, rng, cond, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_call = (best(args.iters + 1) - best(1)) / args.iters
    imgs_per_sec = B / per_call
    print(json.dumps({
        "metric": "dpm20_decoded_imgs_per_sec_bs%d" % B,
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "ms_per_batch": round(per_call * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
