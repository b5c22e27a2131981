"""Parameterized full-UNet A/B harness (single TPU chip).

Times the exact bench.py UNet (reference flagship scale,
savi_ldm_movie_params-res128.py:85-101) under named knob combinations —
the decisive in-context measurement; micro-benchmarks at these operand
sizes are noise-dominated. Consolidates the former bench_unet_ab*.py
series (1.5k LoC of near-clones) into one registry.

Usage:
    python scripts/bench_unet_variants.py --variants current,reference_direct
    python scripts/bench_unet_variants.py --variants all --iters 200

Historical results (v5e chip via tunnel, bf16 weights, ITERS>=100; from
the round-2 bench_unet_ab series — full table in BASELINE.md):

| variant / experiment            | steps/s | verdict |
|---------------------------------|---------|---------|
| round-2 final (fast sm + phase + split-skip + bf16 out) | 208.7 | shipped |
| + stable softmax                | ~-400us/step | fast softmax wins |
| reference-direct upsample       | 198.0 -> 205.1 w/ phase | phase +175us |
| concat decoder (no split-skip)  | 203.7 -> 207.6 w/ split | split +92us |
| fused-GN Pallas kernel          | 6.7 vs 5.36 ms/step | LOSES (XLA fuses) |
| dpa / "auto" attention backend  | == einsum in context | einsum default |
| winograd F(2,3) kernel          | 167us vs 57us direct | LOSES (VPU xforms) |
| fused-MHA Pallas kernel (r4)    | 160.2 vs ~206 | LOSES in context (XLA
  already fuses the softmax chain at these token counts; the kernel's
  per-batch-item grid serializes what XLA batches) |
| div-after-softmax, full-bf16 softmax, fused q/kv, merged-1conv upsample,
  per-jit compiler_options sweeps | all regress or noise | reverted |
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# knob overlays on the flagship bench config; every knob is a UNetModel
# field so any combination stays checkpoint-compatible
VARIANTS = {
    # the shipping bench.py configuration
    "current": dict(),
    # reference-faithful execution: direct nearest+conv upsample, concat
    # decoder, stable softmax, f32 final conv (same params as current)
    "reference_direct": dict(phase_upsample=False, split_skip=False,
                             attn_softmax="stable",
                             conv_out_compute="f32"),
    "stable_softmax": dict(attn_softmax="stable"),
    "direct_upsample": dict(phase_upsample=False),
    "concat_decoder": dict(split_skip=False),
    "f32_conv_out": dict(conv_out_compute="f32"),
    "fused_gn": dict(fused_gn=True),
    "dpa_attention": dict(attn_backend="dpa"),
    "auto_attention": dict(attn_backend="auto"),
    "fused_attention": dict(attn_backend="fused"),
}


def time_unet(overrides, iters, tries=3):
    import jax
    import jax.numpy as jnp

    from slotdiffusion_tpu.models.unet import UNetModel

    B, LATENT, SLOTS, SLOT_DIM = 32, (32, 32), 15, 192
    cfg = dict(
        in_channels=3, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8, 4, 2), dropout=0.0,
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        context_dim=SLOT_DIM, conv_out_compute="bf16",
        dtype=jnp.bfloat16)
    cfg.update(overrides)
    unet = UNetModel(**cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, *LATENT, 3), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    params = unet.init(jax.random.PRNGKey(1), x, t, ctx)["params"]
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)

    @jax.jit
    def chain(params, x, t, ctx):
        def body(i, carry):
            eps = unet.apply({"params": params}, carry, t, ctx)
            return carry + 0.001 * eps.astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0, 0]

    float(chain(params, x, t, ctx))  # compile
    best = 0.0
    for _ in range(tries):
        t0 = time.time()
        float(chain(params, x, t, ctx))
        best = max(best, iters / (time.time() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="current,reference_direct",
                    help="comma list from %s or 'all'" %
                         ",".join(VARIANTS))
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    names = list(VARIANTS) if args.variants == "all" \
        else args.variants.split(",")
    results = {}
    for name in names:
        sps = time_unet(VARIANTS[name], args.iters)
        results[name] = sps
        print(f"{name:24s} {sps:8.1f} steps/s "
              f"({1e3 / sps:6.3f} ms/step)")
    base = results.get("current")
    if base:
        for name, sps in results.items():
            if name != "current":
                delta_us = (1e3 / sps - 1e3 / base) * 1e3
                print(f"{name:24s} delta vs current: "
                      f"{delta_us:+.0f} us/step")


if __name__ == "__main__":
    main()
