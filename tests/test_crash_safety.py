"""Checkpoint crash safety (SURVEY §5 preemption resilience).

"last" saves go to unique step-named dirs with `ckpt_last` as an
atomically-swapped symlink (trainer.py:_finalize_last): a SIGKILL at any
instant — including mid-async-write — must leave a complete, loadable
checkpoint reachable through `ckpt_last`. The old save-over-the-path
scheme had a window (orbax force=True deletes the destination before the
new write commits) where preemption lost the only "last" checkpoint.
"""

import os
import os.path as osp
import re
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _crash_fit(ckp_path, max_epochs, save_interval, resume_from=None,
               seed_cpu=False):
    """Tiny VQ-VAE fit with configurable save cadence. Shared by the
    in-proc tests and the SIGKILL child process (same config -> same
    state tree, so the parent can restore what the child saved)."""
    if seed_cpu:  # child process: defeat the axon sitecustomize
        jax.config.update("jax_platforms", "cpu")

    from slotdiffusion_tpu.data import DataModule
    from slotdiffusion_tpu.data.synthetic import SyntheticImageDataset
    from slotdiffusion_tpu.methods import build_method
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.utils import BaseParams

    params = BaseParams()
    params.model = "VQVAE"
    params.resolution = (16, 16)
    params.max_epochs = max_epochs
    params.lr = 1e-3
    params.warmup_steps_pct = 0.5
    params.train_batch_size = 8
    params.val_batch_size = 8
    params.num_workers = 1
    params.optimizer = "sgd"
    params.use_ema = True
    params.ema_decay = 0.99
    params.eval_interval = 10**6
    params.save_interval = save_interval
    params.print_iter = 10**6
    params.enc_dec_dict = dict(
        resolution=16, in_channels=3, z_channels=3, ch=8, ch_mult=[1],
        num_res_blocks=1, attn_resolutions=[], out_ch=3, dropout=0.0)
    params.vq_dict = dict(n_embed=16, embed_dim=3, percept_loss_w=0.0)
    params.recon_loss_w = 1.0
    params.quant_loss_w = 1.0

    train_set = SyntheticImageDataset(resolution=(16, 16), num_samples=16)
    dm = DataModule(params, train_set, train_set)
    method = build_method(model=build_model(params), datamodule=dm,
                          params=params, ckp_path=ckp_path)
    method.fit(resume_from=resume_from, san_check_val_step=0)
    return method


def _target_step(link):
    m = re.search(r"ckpt_last-(\d+)", os.readlink(link))
    return int(m.group(1))


@pytest.mark.fast
def test_ckpt_last_is_atomic_symlink(tmp_path):
    """After a normal fit: ckpt_last is a symlink to the newest complete
    step-named save, superseded saves are pruned, and the restore is
    bit-identical to the live state."""
    from slotdiffusion_tpu.training.checkpoint import load_train_state

    ckp = str(tmp_path / "run")
    method = _crash_fit(ckp, max_epochs=3, save_interval=0.5)  # save/step

    link = osp.join(ckp, "ckpt_last")
    assert osp.islink(link) and osp.isdir(link)
    live = jax.device_get(method.state)
    # the pointer names the step it holds
    assert _target_step(link) == int(live.step) - 1 or \
        _target_step(link) <= int(live.step)
    # superseded ckpt_last-* dirs are pruned: only the target remains
    siblings = [d for d in os.listdir(ckp) if d.startswith("ckpt_last-")]
    assert siblings == [os.readlink(link)]

    restored = load_train_state(link)  # raw dict tree
    assert int(np.asarray(restored["step"])) == _target_step(link)
    assert "params" in restored and "ema" in restored


@pytest.mark.fast
def test_legacy_dir_ckpt_last_upgrades(tmp_path):
    """A real-directory ckpt_last from an older run still loads, and the
    next save upgrades it to the symlink scheme without a crash window."""
    import shutil

    from slotdiffusion_tpu.training.checkpoint import load_train_state

    ckp = str(tmp_path / "run")
    _crash_fit(ckp, max_epochs=2, save_interval=0.5)
    link = osp.join(ckp, "ckpt_last")
    target = osp.join(ckp, os.readlink(link))
    # forge the legacy layout: ckpt_last as a plain directory
    os.remove(link)
    shutil.move(target, link)
    assert osp.isdir(link) and not osp.islink(link)
    load_train_state(link)  # readers take it as-is

    method = _crash_fit(ckp, max_epochs=4, save_interval=0.5,
                        resume_from=link)
    assert osp.islink(osp.join(ckp, "ckpt_last"))
    assert not osp.exists(osp.join(ckp, "ckpt_last-legacy"))  # pruned
    assert int(jax.device_get(method.state).step) > 0


def test_sigkill_mid_training_leaves_loadable_ckpt_last(tmp_path):
    """Kill -9 a training process after it has started overwriting its
    "last" checkpoint; the survivor pointed to by ckpt_last must restore,
    and a resumed fit must advance past it."""
    from slotdiffusion_tpu.training.checkpoint import load_train_state

    ckp = str(tmp_path / "run")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, 'tests'); "
         "import test_crash_safety as t; "
         f"t._crash_fit({ckp!r}, max_epochs=10000, save_interval=0.5, "
         "seed_cpu=True)"],
        cwd=REPO, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT)
    link = osp.join(ckp, "ckpt_last")
    targets = set()
    try:
        deadline = time.time() + 900
        while time.time() < deadline and len(targets) < 3:
            if osp.islink(link):
                targets.add(os.readlink(link))
            assert child.poll() is None, "training child died on its own"
            time.sleep(0.2)
        assert len(targets) >= 3, "child never rotated ckpt_last"
    finally:
        os.kill(child.pid, signal.SIGKILL)
        child.wait()

    # whatever instant the kill hit: the pointer resolves to a complete,
    # restorable checkpoint
    assert osp.islink(link) and osp.isdir(link)
    restored = load_train_state(link)  # raw dict tree
    step = int(np.asarray(restored["step"]))
    assert step >= 1 and step == _target_step(link)

    # resume past the crash point (fresh process state in-proc)
    method = _crash_fit(ckp, max_epochs=step // 2 + 2,
                        save_interval=100.0, resume_from=link)
    assert int(jax.device_get(method.state).step) > step
