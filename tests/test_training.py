"""Trainer / optimizer / EMA unit tests + a tiny end-to-end fit on the
8-virtual-device CPU mesh (the DDP-analog path, SURVEY.md §2.3)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
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
