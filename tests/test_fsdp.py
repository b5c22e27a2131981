"""FSDP (ZeRO-3-style) sharding over the mesh's `data` axis.

`params.fsdp=True` lays large param/optimizer/EMA leaves out sharded over
`data` (parallel/tp.py:fsdp_augment) and lets GSPMD insert the per-layer
all-gathers / gradient reduce-scatters. Resharding is semantics-preserving,
so an FSDP step must produce the same losses and param updates as the
replicated step — while the ZeRO trio (params, mu/nu, EMA shadow) actually
lives sharded.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from slotdiffusion_tpu.parallel.mesh import make_mesh, shard_batch
from slotdiffusion_tpu.parallel.tp import (fsdp_augment, fsdp_param_count,
                                           train_state_shardings)

pytestmark = pytest.mark.fast


def _one_step(mesh, fsdp):
    import __graft_entry__ as g
    from slotdiffusion_tpu.data import DataModule, build_dataset
    from slotdiffusion_tpu.methods import build_method
    from slotdiffusion_tpu.models import build_model

    p = g._tiny_savi_ldm_params()
    p.train_batch_size = 8
    p.max_steps = 1
    p.fsdp = fsdp
    train_set, val_set = build_dataset(p)
    dm = DataModule(p, train_set, val_set)
    model = build_model(p)
    method = build_method(model=model, datamodule=dm, params=p,
                          ckp_path=None, mesh=mesh)
    batch = next(iter(dm.train_loader))
    batch = shard_batch(batch, mesh)
    method.state = method._init_state(batch)
    method._build_steps()
    state, metrics = method._train_step(method.state, batch)
    return state, metrics


def test_fsdp_augment_rules():
    big = np.zeros((64, 512), np.float32)
    # largest divisible unsharded dim gets 'data'
    assert fsdp_augment(P(), big, 8) == P(None, "data")
    # composes with a TP spec: the model-sharded dim is left alone
    assert fsdp_augment(P(None, "model"), big, 8) == P("data", "model")
    # small leaves replicate (below _FSDP_MIN_SIZE)
    assert fsdp_augment(P(), np.zeros((8, 8), np.float32), 8) == P()
    # no divisible dim -> base spec unchanged
    odd = np.zeros((63, 257, 3), np.float32)
    assert fsdp_augment(P(), odd, 8) == P()
    # scalars replicate
    assert fsdp_augment(P(), np.zeros((), np.float32), 8) == P()


@pytest.mark.slow
def test_fsdp_step_matches_replicated():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rep_state, rep_metrics = _one_step(make_mesh(data=8, model=1),
                                       fsdp=False)
    fs_state, fs_metrics = _one_step(make_mesh(data=8, model=1), fsdp=True)

    rep_loss = float(jax.device_get(rep_metrics["train/denoise_loss"]))
    fs_loss = float(jax.device_get(fs_metrics["train/denoise_loss"]))
    assert np.isfinite(fs_loss)
    np.testing.assert_allclose(fs_loss, rep_loss, rtol=2e-4)

    # the ZeRO layout actually engaged: params, optimizer moments and the
    # EMA shadow all have leaves living sharded over `data`
    mesh = make_mesh(data=8, model=1)
    assert fsdp_param_count(fs_state.params, mesh) > 0
    sh = train_state_shardings(fs_state, mesh, fsdp=True)
    for name, sub in (("params", sh.params),
                      ("opt_state", sh.opt_state),
                      ("ema", sh.ema)):
        specs = {s.spec for s in jax.tree_util.tree_leaves(
            sub, is_leaf=lambda x: hasattr(x, "spec"))}
        assert any("data" in spec for spec in specs), name

    # updated params agree leaf-for-leaf with the replicated run
    rep_p = jax.device_get(rep_state.params)
    fs_p = jax.device_get(fs_state.params)
    flat_r = jax.tree_util.tree_leaves_with_path(rep_p)
    flat_f = jax.tree_util.tree_leaves_with_path(fs_p)
    for (pr, lr), (pf, lf) in zip(flat_r, flat_f):
        assert pr == pf
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pr))


@pytest.mark.slow
def test_fsdp_composes_with_tp():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rep_state, rep_metrics = _one_step(make_mesh(data=8, model=1),
                                       fsdp=False)
    mix_state, mix_metrics = _one_step(make_mesh(data=2, model=4),
                                       fsdp=True)
    rep_loss = float(jax.device_get(rep_metrics["train/denoise_loss"]))
    mix_loss = float(jax.device_get(mix_metrics["train/denoise_loss"]))
    np.testing.assert_allclose(mix_loss, rep_loss, rtol=2e-4)
    # both axes engaged somewhere in the layout
    mesh = make_mesh(data=2, model=4)
    sh = train_state_shardings(mix_state, mesh, fsdp=True)
    specs = {s.spec for s in jax.tree_util.tree_leaves(
        sh.params, is_leaf=lambda x: hasattr(x, "spec"))}
    assert any("data" in spec for spec in specs)
    assert any("model" in spec for spec in specs)
