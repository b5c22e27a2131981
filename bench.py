"""Headline benchmark: slot-conditioned UNet denoising throughput.

Measures the hot loop of SlotDiffusion — the LDM UNet forward (one denoise
step) at the reference's flagship scale (savi_ldm_movie_params-res128.py:
85-101): 128x128 images -> 32x32x3 VQ latents, model_channels=128,
channel_mult (1,2,3,4), cross-attention on 15 slots x 192-d at downsample
factors (8,4,2), batch 32, bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares achieved device FLOP/s against an A40 running the
same UNet in fp16 at 30% of peak (149.7 TFLOPs * 0.3 ≈ 44.9 TFLOPs
effective) — the reference's training hardware (README.md:59-66). The
north-star target is >= 3.0 (BASELINE.md).
"""

import json
import time

import numpy as np

A40_EFFECTIVE_FLOPS = 149.7e12 * 0.30  # fp16 tensor-core peak * 30%


def main():
    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.models.unet import UNetModel

    B = 32
    LATENT = (32, 32)
    SLOTS, SLOT_DIM = 15, 192

    unet = UNetModel(
        in_channels=3,
        model_channels=128,
        out_channels=3,
        num_res_blocks=2,
        attention_resolutions=(8, 4, 2),
        dropout=0.0,
        channel_mult=(1, 2, 3, 4),
        num_head_channels=32,
        context_dim=SLOT_DIM,
        dtype=jnp.bfloat16,
    )

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, *LATENT, 3), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    variables = unet.init(jax.random.PRNGKey(1), x, t, ctx)

    @jax.jit
    def denoise_step(params, x, t, ctx):
        return unet.apply({"params": params}, x, t, ctx)

    # compile + FLOP count
    lowered = denoise_step.lower(variables["params"], x, t, ctx)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0

    out = denoise_step(variables["params"], x, t, ctx)
    out.block_until_ready()

    # timed runs
    n_iters = 30
    start = time.perf_counter()
    for _ in range(n_iters):
        out = denoise_step(variables["params"], x, t, ctx)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    steps_per_sec = n_iters / elapsed
    achieved_flops = steps_per_sec * flops_per_step
    if flops_per_step > 0:
        a40_steps_per_sec = A40_EFFECTIVE_FLOPS / flops_per_step
        vs_baseline = steps_per_sec / a40_steps_per_sec
    else:
        vs_baseline = 0.0

    print(json.dumps({
        "metric": "unet_denoise_steps_per_sec_bs32",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
