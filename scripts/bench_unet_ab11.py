"""Full-UNet A/B, batch 11: merged-phase upsample conv.

The 4 phase convs of _PhaseUpConv share the same padded input window
geometry: with pad (1,1) and a 2x2 kernel the conv output has H+1 rows,
and phase a reads rows a..H+a. So all 4 phases can run as ONE conv with
kernel [2,2,C,4F] (phase kernels stacked on the output-channel axis),
then per-phase shifted slices + depth-to-space. 4x the M rows per MXU
call and one output materialization instead of four.

Usage: python scripts/bench_unet_ab11.py [--iters 50]
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


def make_merged(um):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class MergedPhaseUpConv(nn.Module):
        features: int
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            C = x.shape[-1]
            W = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, C, self.features), jnp.float32)
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            Wf = W.astype(jnp.float32)
            rows = {0: (Wf[0], Wf[1] + Wf[2]), 1: (Wf[0] + Wf[1], Wf[2])}

            def phase_kernel(a, bb):
                def cols(Wr):
                    return {0: (Wr[0], Wr[1] + Wr[2]),
                            1: (Wr[0] + Wr[1], Wr[2])}[bb]
                r0, r1 = rows[a]
                c00, c01 = cols(r0)
                c10, c11 = cols(r1)
                return jnp.stack([jnp.stack([c00, c01], 0),
                                  jnp.stack([c10, c11], 0)], 0)

            K_all = jnp.concatenate(
                [phase_kernel(a, bb) for a in (0, 1) for bb in (0, 1)],
                axis=-1).astype(self.dtype)  # [2,2,C,4F]
            xd = x.astype(self.dtype)
            dn = jax.lax.conv_dimension_numbers(
                xd.shape, K_all.shape, ("NHWC", "HWIO", "NHWC"))
            full = jax.lax.conv_general_dilated(
                xd, K_all, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn)  # [B, H+1, W+1, 4F]
            B_, H1, W1, _ = full.shape
            H, Wd = H1 - 1, W1 - 1
            F = self.features
            outs = []
            for p, (a, bb) in enumerate(
                    [(a, bb) for a in (0, 1) for bb in (0, 1)]):
                outs.append(jax.lax.slice(
                    full, (0, a, bb, p * F),
                    (B_, H + a, Wd + bb, (p + 1) * F)))
            z = jnp.stack(outs, 0).reshape(2, 2, B_, H, Wd, F)
            z = z.transpose(2, 3, 0, 4, 1, 5).reshape(B_, 2 * H, 2 * Wd, F)
            return (z + b.astype(self.dtype)).astype(xd.dtype)

    class MergedUpsample(nn.Module):
        out_channels: int
        use_conv: bool = True
        phase: bool = True
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            if self.use_conv:
                return MergedPhaseUpConv(self.out_channels,
                                         dtype=self.dtype,
                                         name="Conv_0")(x)
            return um._upsample2x(x)

    return MergedUpsample


def check_parity(um):
    import jax
    import jax.numpy as jnp

    MergedUpsample = make_merged(um)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64),
                          jnp.float32)
    ref = um.Upsample(64, phase=False, dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(1), x)
    with jax.default_matmul_precision("float32"):
        y_ref = ref.apply(v, x)
        y_new = MergedUpsample(64, dtype=jnp.float32).apply(v, x)
    err = float(jnp.max(jnp.abs(y_ref - y_new)))
    scale = float(jnp.max(jnp.abs(y_ref)))
    print(f"parity max|diff|={err:.3e} (max|ref|={scale:.3e})")
    assert err < 1e-4 * max(scale, 1.0), "merged phase upsample mismatch"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    args = parser.parse_args()

    from slotdiffusion_tpu.models import unet as um

    check_parity(um)

    results = {}
    results["baseline_4conv"] = time_unet(args.iters)
    orig = um.Upsample
    um.Upsample = make_merged(um)
    try:
        results["merged_1conv"] = time_unet(args.iters)
    finally:
        um.Upsample = orig

    base = results["baseline_4conv"]
    print(f"{'variant':<16} {'ms/step':>9} {'delta_us':>9} {'steps/s':>9}")
    for k, v in results.items():
        print(f"{k:<16} {v * 1e3:9.3f} {(base - v) * 1e6:9.1f} "
              f"{1.0 / v:9.1f}")


if __name__ == "__main__":
    main()
