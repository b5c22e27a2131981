"""Headline benchmarks: denoise fwd, train step, and DPM-decoded sampling.

All three measure the hot paths of SlotDiffusion at the reference's
flagship scale (savi_ldm_movie_params-res128.py:85-121): 128x128 images
-> 32x32x3 VQ latents, model_channels=128, channel_mult (1,2,3,4),
cross-attention on 15 slots x 192-d at downsample factors (8,4,2), bf16
compute.

1. `unet_train_steps_per_sec_bs32` — fwd+bwd+Adam on the denoise
   objective, the actual training workload (reference operating point:
   fp16 DDP on A40s, docs/benchmark.md:33-38).
2. `dpm20_decoded_imgs_per_sec_bs16` — slot-conditioned LDM decode:
   20 DPM-Solver++ steps order 3 + quantize-as-denoise + VQ-VAE decode
   (the eval-time path, reference cond_ddpm.py:134-212).
3. `unet_denoise_steps_per_sec_bs32` — one UNet forward (the fwd
   roofline headline tracked since round 1). Printed LAST so the
   driver's parsed line stays round-comparable.

Methodology: each op is chained `ITERS` times inside a single jitted
`lax.fori_loop` and a scalar of the result is fetched to host. Host-side
dispatch loops with `block_until_ready` are NOT trustworthy on this
device tunnel (they report impossible >peak FLOP/s — the ready signal
doesn't await remote completion); the in-program loop + host fetch
measures true device time. Calibration: an 8192^3 bf16 matmul chain
measured this way hits ~169 TFLOP/s =~ 86% of a v5e's 197 TFLOP/s peak.

Prints one JSON line per metric: {"metric", "value", "unit",
"vs_baseline"}.

`vs_baseline` compares against an A40 — the reference's training
hardware (README.md:59-66) — at 44.9 TFLOP/s effective (149.7 sparse
fp16 peak * 0.30 = 60% DENSE-fp16 MFU, deliberately generous to the
A40), with FLOPs read from XLA cost_analysis of the REFERENCE-DIRECT
formulation (phase_upsample=False) so our algorithmic MAC savings are
never credited to the A40. The train-step baseline additionally credits
the A40's Adam update as pure HBM traffic at its full 696 GB/s. Full
audit: BASELINE.md appendix.
"""

import json
import time

A40_EFFECTIVE_FLOPS = 149.7e12 * 0.30  # sparse fp16 peak * 30% = 60% dense MFU
A40_HBM_BW = 696e9  # A40 datasheet GB/s, charged at 100% efficiency


def _best(fn, tries):
    ts = []
    for _ in range(tries):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _flops_of(jitted, *args):
    """XLA-counted flops of one call (lowered analysis; compile fallback)."""
    lowered = jitted.lower(*args)
    try:
        cost = lowered.cost_analysis()
    except Exception:
        cost = None
    if not cost:
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) if cost else 0.0


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }), flush=True)


def bench_train(jax, jnp, unet, unet_ref, params_f32, x, t, ctx):
    """Flagship TRAIN step: fwd+bwd+Adam at bs32, f32 master weights."""
    import optax

    eps = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params_f32)

    def make_step(model):
        def loss_fn(p, xx, ee):
            pred = model.apply({"params": p}, xx, t, ctx)
            return jnp.mean((pred - ee) ** 2)

        def step(params, opt_state, x, eps):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, eps)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            x = x + loss.astype(x.dtype) * 1e-12  # keep every step live
            return params, opt_state, x

        return step

    def make_chain(model):
        step = make_step(model)

        @jax.jit
        def chain(params, opt_state, x, eps, iters):
            def body(i, carry):
                params, opt_state, x = carry
                return step(params, opt_state, x, eps)

            params, opt_state, x = jax.lax.fori_loop(
                0, iters, body, (params, opt_state, x))
            return x[0, 0, 0, 0]

        return chain

    # A40 estimate: reference-direct train FLOPs at 44.9 TFLOP/s effective
    # + Adam's f32 state traffic (read p/mu/nu/g, write p/mu/nu = 7 x 4B
    # per param) at the FULL 696 GB/s — both terms generous to the A40
    # (its convs never hit 60% dense MFU and its HBM never 100%).
    # FLOPs are lowered from ONE plain step (no loop) so cost_analysis
    # never sees a dynamic-trip-count while body.
    flops = _flops_of(jax.jit(make_step(unet_ref)),
                      params_f32, opt_state, x, eps)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params_f32))
    adam_bytes = 7.0 * 4.0 * n_params
    a40_s = flops / A40_EFFECTIVE_FLOPS + adam_bytes / A40_HBM_BW

    chain = make_chain(unet)
    ITERS = 20
    float(chain(params_f32, opt_state, x, eps, 1))
    float(chain(params_f32, opt_state, x, eps, ITERS + 1))
    per_step = (
        _best(lambda: float(chain(params_f32, opt_state, x, eps, ITERS + 1)),
              4)
        - _best(lambda: float(chain(params_f32, opt_state, x, eps, 1)), 4)
    ) / ITERS
    _emit("unet_train_steps_per_sec_bs32", 1.0 / per_step, "steps/s",
          (1.0 / per_step) / (1.0 / a40_s))


def bench_sampling(jax, jnp):
    """Eval-time decode: 20-step DPM-Solver++ + VQ decode, bs16."""
    from slotdiffusion_tpu.configs_base import ldm_dec_dict
    from slotdiffusion_tpu.models.slot_diffusion import _build_dm_decoder

    B, SLOTS, SLOT_DIM = 16, 15, 192
    dd = ldm_dec_dict((128, 128), SLOT_DIM)
    import copy

    dd_ref = copy.deepcopy(dd)
    # UNet reference-direct; the VQ-VAE decoder has no phase rewrite
    # (identical algorithm both sides), so only the unet dict changes.
    dd_ref["unet_dict"]["phase_upsample"] = False
    model = _build_dm_decoder(dd, jnp.bfloat16)
    model_ref = _build_dm_decoder(dd_ref, jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (B, 128, 128, 3), jnp.float32)
    cond = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "diffusion": rng},
        img, cond, method=model.loss_function)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables["params"])

    def make_once(m):
        def once(params, rng, cond):
            return m.apply(
                {"params": params},
                rngs={"diffusion": rng},
                method=lambda mm: mm.decode_latent(
                    mm.generate_imgs(rng, cond=cond, use_dpm=True)))

        return once

    def make_chain(m):
        once = make_once(m)

        @jax.jit
        def chain(params, rng, cond, iters):
            def body(i, acc):
                imgs = once(params, jax.random.fold_in(rng, i), cond)
                return acc + imgs[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return chain

    # FLOPs from ONE plain decode call (the 20 DPM steps inside are a
    # static-length scan, which cost_analysis scales correctly; the
    # dynamic-trip outer loop is excluded).
    flops = _flops_of(jax.jit(make_once(model_ref)), params, rng, cond)
    a40_imgs_per_s = B / (flops / A40_EFFECTIVE_FLOPS)

    chain = make_chain(model)
    ITERS = 5
    float(chain(params, rng, cond, 1))
    float(chain(params, rng, cond, ITERS + 1))
    per_call = (
        _best(lambda: float(chain(params, rng, cond, ITERS + 1)), 4)
        - _best(lambda: float(chain(params, rng, cond, 1)), 4)
    ) / ITERS
    _emit("dpm20_decoded_imgs_per_sec_bs16", B / per_call, "imgs/s",
          (B / per_call) / a40_imgs_per_s)


def main():
    import os

    import jax

    # persistent compile cache: reruns (and the driver's round-end run
    # after a warm validation run) skip the ~20-min flagship compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(
                          __file__)), ".cache", "jax"))
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
        # reference AMP runs the final conv in fp16 (train.py --fp16), so
        # bf16 operands + f32 accumulation is the apples-to-apples setting
        conv_out_compute="bf16",
        dtype=jnp.bfloat16,
    )

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, *LATENT, 3), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(rng, (B, SLOTS, SLOT_DIM), jnp.float32)
    variables = unet.init(jax.random.PRNGKey(1), x, t, ctx)
    params_f32 = variables["params"]
    # inference-weight layout: sampling loops cast the static weights to
    # the compute dtype once per generate call, not once per denoise step
    # (training keeps f32 master weights in the optimizer as usual)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params_f32)

    # FLOPs for the A40 comparison: compiled from the REFERENCE-DIRECT
    # formulation (phase_upsample=False), i.e. the algorithm the
    # reference's torch/cuDNN path executes. Our timed UNet uses the
    # exact-rewrite phase-conv upsample, which does ~2.25x fewer MACs in
    # the decoder upsamples; charging the A40 those savings would credit
    # IT with OUR algorithmic improvement.
    unet_ref = unet.copy(phase_upsample=False)

    @jax.jit
    def denoise_step_ref(params, x, t, ctx):
        return unet_ref.apply({"params": params}, x, t, ctx)

    flops_per_step = _flops_of(denoise_step_ref, params, x, t, ctx)

    bench_train(jax, jnp, unet, unet_ref, params_f32, x, t, ctx)
    bench_sampling(jax, jnp)

    @jax.jit
    def chain(params, x, t, ctx, iters):
        def body(i, x):
            eps = unet.apply({"params": params}, x, t, ctx)
            return eps.astype(jnp.float32)  # feed prediction back in

        return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0, 0]

    ITERS = 50
    # warm both iteration counts (two compiled programs)
    float(chain(params, x, t, ctx, 1))
    float(chain(params, x, t, ctx, ITERS + 1))

    per_step = (
        _best(lambda: float(chain(params, x, t, ctx, ITERS + 1)), 6)
        - _best(lambda: float(chain(params, x, t, ctx, 1)), 6)
    ) / ITERS

    steps_per_sec = 1.0 / per_step
    if flops_per_step > 0:
        a40_steps_per_sec = A40_EFFECTIVE_FLOPS / flops_per_step
        vs_baseline = steps_per_sec / a40_steps_per_sec
    else:
        vs_baseline = 0.0
    # headline LAST: the driver parses the final JSON line
    _emit("unet_denoise_steps_per_sec_bs32", steps_per_sec, "steps/s",
          vs_baseline)


if __name__ == "__main__":
    main()
