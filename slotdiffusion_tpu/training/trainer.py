"""Trainer — the TPU-native training engine.

Replaces the external `nerv.training.BaseMethod` trainer the reference
depends on (SURVEY.md §2.1; usage scripts/train.py:65-76). One jitted SPMD
train step over a `data`-axis mesh subsumes what the reference assembles
from DDP + AMP GradScaler + manual loops:

- loss aggregation: the model returns a dict of named losses; each key
  `foo_loss` is weighted by `params.foo_loss_w` (reference configs, e.g.
  savi_ldm_movie_params-res128.py:137)
- cosine warmup LR schedule incl. per-group LRs (img_based/method.py:77-85,
  235-285), grad clipping (`clip_grad`), grad accumulation
  (`grad_accum_steps`), all inside optax
- EMA with LitEma warmup semantics (ddpm/ema.py), stored in TrainState and
  swapped in for eval/sampling instead of mutating modules
- step-scheduled scalars (dVAE gumbel tau annealing, SlotFormer loss decay —
  video_based/method.py:549-567, vp_vqa/method.py:188-210) evaluated inside
  the jitted step from `state.step`
- orbax checkpointing with save_interval fractions of an epoch, resume,
  and sanity-check validation (`san_check_val_step`, scripts/train.py:76)
- bf16 autocast replaces AMP: modules take a compute dtype; params stay fp32

The data-parallel contract matches the reference's `--ddp` flag
(scripts/train.py:89): shard the batch, replicate params, XLA inserts the
gradient all-reduce over ICI.
"""

import glob
import json
import os
import shutil
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..parallel.mesh import (batch_sharding, make_mesh, prefetch_to_device,
                             replicated_sharding, shard_batch)
from ..utils.misc import AverageMeter, mkdir_or_exist
from .ema import ExponentialMovingAverage, swap_ema_params
from .optim import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: Optional[ExponentialMovingAverage]
    rng: jnp.ndarray


class JSONLLogger:
    """Minimal metrics logger: stdout + JSONL file (wandb replacement;
    the reference logs exclusively to wandb, scripts/train.py:58-63)."""

    def __init__(self, log_dir, name="train", enabled=True):
        self.enabled = enabled
        self.path = None
        if enabled and log_dir:
            mkdir_or_exist(log_dir)
            self.path = os.path.join(log_dir, f"{name}_log.jsonl")

    def log(self, record: Dict, step: int):
        if not self.enabled:
            return
        record = {
            k: (float(v) if not isinstance(v, str) else v)
            for k, v in record.items()
        }
        record["step"] = int(step)
        record["time"] = time.time()
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")


class WandbLogger(JSONLLogger):
    """JSONL logging plus wandb when the package is importable and
    `params.use_wandb` is set — the reference's logging backend
    (scripts/train.py:58-63). Run id pinning for preemption resume is
    supported via `params.wandb_id`."""

    def __init__(self, log_dir, name="train", enabled=True, project=None,
                 run_name=None, run_id=None, config=None):
        super().__init__(log_dir, name=name, enabled=enabled)
        self._wandb = None
        if not enabled:
            return
        try:
            import wandb
            wandb.init(project=project or "SlotDiffusionTPU",
                       name=run_name, id=run_id,
                       resume="allow" if run_id else None, config=config)
            self._wandb = wandb
        except Exception:
            self._wandb = None  # fall back to JSONL only

    def log(self, record: Dict, step: int):
        super().log(record, step)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in record.items() if k != "time"},
                step=int(step))


class Trainer:
    """Generic trainer over a (model, datamodule, params) triple.

    Models implement:
        compute_losses(batch, sched=None) -> (out_dict, loss_dict)
    as a linen method (run under `.apply` with rngs). Losses named `*_loss`
    are weighted by `params.get(f'{name}_w', 1.0)` and summed.
    """

    def __init__(
        self,
        model,
        datamodule,
        params,
        ckp_path: Optional[str] = None,
        step_scalars: Optional[Dict[str, Callable]] = None,
        host_metrics_fn: Optional[Callable] = None,
        viz_fn: Optional[Callable] = None,
        rng_names=("diffusion", "gumbel", "dropout", "default"),
        mesh=None,
        seed: int = 0,
    ):
        self.model = model
        self.datamodule = datamodule
        self.params = params
        self.ckp_path = ckp_path
        self.step_scalars = step_scalars or {}
        self.host_metrics_fn = host_metrics_fn
        self.viz_fn = viz_fn
        self.rng_names = tuple(rng_names)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed

        self.max_epochs = params.max_epochs
        self.steps_per_epoch = len(datamodule.train_loader) \
            if datamodule.train_loader is not None else 0
        self.max_steps = params.get("max_steps", -1)  # smoke-test cap
        self.print_iter = params.get("print_iter", 50)
        self.save_interval = params.get("save_interval", 1.0)
        self.eval_interval = params.get("eval_interval", 1)
        self.clip_grad = params.get("clip_grad", -1)
        self.grad_accum_steps = max(int(params.get("grad_accum_steps", 1)), 1)
        # The LR schedule and EMA advance once per OPTIMIZER step, not per
        # micro-step: optax.MultiSteps only ticks the inner optimizer count
        # every `grad_accum_steps` batches, matching the reference where the
        # scheduler/EMA step after each real optimizer.step()
        # (img_based/method.py:77-85, ddpm/ema.py:29-43).
        self.total_steps = (self.max_epochs * self.steps_per_epoch
                            ) // self.grad_accum_steps

        if params.get("use_wandb", False):
            self.logger = WandbLogger(
                ckp_path, enabled=jax.process_index() == 0,
                project=params.get("project", None),
                run_name=params.get("wandb_name", None),
                run_id=params.get("wandb_id", None),
                config=params.to_dict() if hasattr(params, "to_dict")
                else None)
        else:
            self.logger = JSONLLogger(
                ckp_path, enabled=jax.process_index() == 0)

        # loss weights captured statically for the jitted step, keyed by
        # the full config name `foo_loss_w` (looked up in _weighted_total)
        self._loss_weights = {}
        for k in params.keys():
            if k.endswith("_loss_w"):
                self._loss_weights[k] = float(params.get(k))

        self.use_ema = bool(getattr(model, "use_ema", False) or
                            params.get("use_ema", False))
        self.ema_decay = params.get("ema_decay", 0.9999)
        # path prefix of the subtree the EMA swap applies to at eval
        self.ema_filter_prefix = getattr(model, "ema_filter_prefix", None)

        self._train_step = None
        self._eval_step = None
        self.state = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _init_state(self, sample_batch):
        state = self._init_state_pure(sample_batch)
        # lay the state out over the mesh: replicated on a pure-data mesh;
        # TP param leaves (and their mirrored optimizer/EMA buffers) shard
        # over the `model` axis when it is >1 (parallel/tp.py rules)
        return jax.device_put(state, self._state_shardings(state))

    def _init_state_pure(self, sample_batch):
        """Build the TrainState pytree with no device placement.

        Kept side-effect-free w.r.t. devices so AOT topology sizing can
        run it under `jax.eval_shape` (parallel/aot.py) against abstract
        meshes that have no addressable hardware behind them."""
        rng = jax.random.PRNGKey(self.seed)
        init_rngs = {n: jax.random.fold_in(rng, i)
                     for i, n in enumerate(("params",) + self.rng_names)}
        variables = self.model.init(
            init_rngs, sample_batch, method=getattr(
                self.model, "compute_losses"),
            sched=self._sched_dict(jnp.zeros((), jnp.int32)))
        # graft configured stage-1 checkpoints (frozen VQ-VAE / dVAE / LDM)
        # into the freshly initialized tree — the functional analog of the
        # reference's ctor-time .pth loading (VQVAE.py:166-178)
        from .checkpoint import apply_pretrained
        variables = apply_pretrained(variables, self.params)
        params = variables["params"]

        lr_groups = self.params.get("lr_groups", None)
        self.tx, self.lr_schedule = build_optimizer(
            params,
            lr=self.params.lr,
            total_steps=max(self.total_steps, 1),
            warmup_steps=int(
                self.params.get("warmup_steps_pct", 0.0) *
                max(self.total_steps, 1)),
            min_lr=self.params.get("min_lr", 0.0),
            weight_decay=self.params.get("weight_decay", 0.0),
            clip_grad=self.clip_grad,
            grad_accum_steps=self.grad_accum_steps,
            lr_groups=lr_groups,
            optimizer=self.params.get("optimizer", "adam"),
        )
        opt_state = self.tx.init(params)
        ema = ExponentialMovingAverage.create(
            params, decay=self.ema_decay) if self.use_ema else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema=ema,
            rng=rng,
        )

    def _state_shardings(self, state):
        """Sharding tree for a TrainState over self.mesh (cached per
        tree structure via the first call — structures don't change).

        `params.fsdp=True` additionally shards large param/optimizer/EMA
        leaves over the `data` axis (ZeRO-3 layout, parallel/tp.py:
        fsdp_augment); composes freely with TP over `model`."""
        fsdp = bool(self.params.get("fsdp", False))
        if self.mesh.shape.get("model", 1) == 1 and not fsdp:
            return replicated_sharding(self.mesh)
        from ..parallel.tp import train_state_shardings
        return train_state_shardings(state, self.mesh, fsdp=fsdp)

    def _sched_dict(self, step):
        return {k: fn(step) for k, fn in self.step_scalars.items()} or None

    def _make_rngs(self, rng, step):
        base = jax.random.fold_in(rng, step)
        return {n: jax.random.fold_in(base, i)
                for i, n in enumerate(self.rng_names)}

    def _weighted_total(self, loss_dict):
        total = 0.0
        for k, v in loss_dict.items():
            if k.endswith("_loss"):
                total = total + self._loss_weights.get(f"{k}_w", 1.0) * v
        return total

    def _build_steps(self):
        model = self.model

        def train_step(state: TrainState, batch):
            sched = self._sched_dict(state.step)
            rngs = self._make_rngs(state.rng, state.step)

            def loss_fn(p):
                out, losses = model.apply(
                    {"params": p}, batch, sched=sched, train=True,
                    rngs=rngs, method=model.compute_losses)
                return self._weighted_total(losses), losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt_state = self.tx.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if state.ema is None:
                new_ema = None
            elif self.grad_accum_steps > 1:
                # params only change on the k-th micro-step (MultiSteps
                # emits zero updates otherwise); updating the shadow every
                # micro-step would relax it toward frozen params and inflate
                # the (1+n)/(10+n) warmup vs LitEma's per-optimizer-step
                # semantics (ddpm/ema.py:29-43)
                is_update = (state.step + 1) % self.grad_accum_steps == 0
                new_ema = jax.lax.cond(
                    is_update, lambda: state.ema.update(new_params),
                    lambda: state.ema)
            else:
                new_ema = state.ema.update(new_params)
            metrics = {f"train/{k}": v for k, v in losses.items()}
            metrics["train/total_loss"] = total
            metrics["train/grad_norm"] = optax.global_norm(grads)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema=new_ema,
            )
            return new_state, metrics

        def eval_step(state: TrainState, batch, batch_idx):
            p = state.params
            if state.ema is not None:
                prefix = self.ema_filter_prefix
                if prefix is None:
                    p_ema = state.ema.shadow
                else:
                    p_ema = swap_ema_params(
                        p, state.ema,
                        lambda path: path.startswith(prefix))
            sched = self._sched_dict(state.step)
            # fold in the batch index so each val batch draws fresh
            # diffusion timesteps/noise (a fixed step-only fold made every
            # batch's randomness identical — a correlated loss estimator
            # unlike the reference's fresh per-batch draws)
            rngs = self._make_rngs(jax.random.PRNGKey(self.seed + 1),
                                   state.step * 131071 + batch_idx)
            out, losses = model.apply(
                {"params": p}, batch, sched=sched, train=False,
                rngs=rngs, method=model.compute_losses)
            if state.ema is not None:
                _, ema_losses = model.apply(
                    {"params": p_ema}, batch, sched=sched, train=False,
                    rngs=rngs, method=model.compute_losses)
                losses.update(
                    {f"{k}_ema": v for k, v in ema_losses.items()})
            return out, losses

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        state_sh = self._state_shardings(self.state)
        self._train_step = jax.jit(
            train_step,
            in_shardings=(state_sh, data),
            out_shardings=(state_sh, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            eval_step, in_shardings=(state_sh, data, rep),
            out_shardings=(rep, rep))
        # ragged final val batches (drop_last=False) can't be laid out over
        # the data axis; they run through this replicated-input twin instead
        # (one extra compile at the fixed remainder shape, exact averages)
        self._eval_step_rep = jax.jit(
            eval_step, in_shardings=(state_sh, rep, rep),
            out_shardings=(rep, rep))

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------

    def _get_ckptr(self):
        """Persistent AsyncCheckpointer: serialization + file IO run on a
        background thread so the train loop only pays the device->host
        fetch. `params.async_ckpt=False` opts back into blocking saves."""
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp
            self._ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        return self._ckptr

    def wait_for_checkpoints(self):
        """Block until any in-flight async save has committed (and point
        `ckpt_last` at it)."""
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()
        self._finalize_last()

    def _finalize_last(self):
        """Atomically repoint the `ckpt_last` symlink at the newest
        COMMITTED save, then delete superseded `ckpt_last-*` dirs.

        Crash safety (SURVEY §5 preemption resilience): "last" saves go
        to unique step-named dirs, so a SIGKILL at ANY instant leaves
        either the old or the new complete checkpoint reachable through
        `ckpt_last` — unlike saving over the path in place, where
        orbax's force=True deletes the old dir before the new write
        commits and a preemption in that window loses both
        (tests/test_crash_safety.py)."""
        pending = getattr(self, "_pending_last", None)
        if pending is None:
            return
        self._pending_last = None
        if jax.process_index() != 0:
            return
        link = os.path.join(os.path.dirname(pending), "ckpt_last")
        if os.path.isdir(link) and not os.path.islink(link):
            # pre-symlink-scheme directory (older runs): move it aside so
            # the atomic pointer swap below can land
            os.rename(link, link + "-legacy")
        tmp = link + ".tmp"
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(os.path.basename(pending), tmp)
        os.replace(tmp, link)  # atomic pointer swap
        # prune superseded saves + orbax tmp dirs from crashed writes
        for stale in glob.glob(link + "-*"):
            if os.path.abspath(stale) != os.path.abspath(pending):
                shutil.rmtree(stale, ignore_errors=True)

    def save_checkpoint(self, tag="last"):
        if self.ckp_path is None:
            return
        # NO process gate: orbax coordinates multi-process saves itself
        # (primary host writes, the rest participate in its sync
        # barriers) — gating to process 0 deadlocks the commit barrier
        # the moment other processes move on or exit
        # (tests/test_distributed.py multihost fit).
        ckptr = self._get_ckptr()
        # one save in flight at a time; also guards re-saving a path the
        # previous async write is still committing
        ckptr.wait_until_finished()
        self._finalize_last()
        # fetch to host BEFORE the async write: the jitted train step
        # donates the state buffers, so a background read of live device
        # arrays would race the next step's in-place update
        state_host = jax.device_get(self.state)
        if tag == "last":
            step = int(state_host.step)
            # same step == identical state: skip (also keeps the skip
            # decision process-local and deterministic, so every process
            # makes the same call and orbax's barrier stays aligned)
            if getattr(self, "_last_saved_step", None) == step:
                return
            self._last_saved_step = step
            path = os.path.join(self.ckp_path, f"ckpt_last-{step}")
            # leftover dir with this name from a pre-crash run may be the
            # current ckpt_last target: never force-overwrite it in place.
            # Multi-host: probe on process 0 only and broadcast the result
            # — per-process filesystem probing can observe different
            # states (stale NFS caches) and desynchronize orbax's
            # coordinated save (ADVICE r4).
            retries = 0
            if jax.process_index() == 0:
                while os.path.exists(path + "r" * retries):
                    retries += 1
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                retries = int(multihost_utils.broadcast_one_to_all(
                    np.int32(retries)))
            path += "r" * retries
        else:
            path = os.path.join(self.ckp_path, f"ckpt_{tag}")
        path = os.path.abspath(path)
        ckptr.save(path, state_host, force=True)
        if tag == "last":
            self._pending_last = path
        if not self.params.get("async_ckpt", True):
            ckptr.wait_until_finished()
            self._finalize_last()

    def load_checkpoint(self, path):
        import orbax.checkpoint as ocp
        self.wait_for_checkpoints()
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.device_get(self.state)
        restored = ckptr.restore(os.path.abspath(path), abstract)
        self.state = jax.device_put(restored,
                                    self._state_shardings(restored))

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def fit(self, resume_from=None, san_check_val_step=2):
        loader = self.datamodule.train_loader
        sample_batch = next(iter(loader))
        sample_batch = shard_batch(sample_batch, self.mesh)
        if self.state is None:
            self.state = self._init_state(sample_batch)
        if self._train_step is None:
            self._build_steps()
        if resume_from:
            self.load_checkpoint(resume_from)

        if san_check_val_step:
            self.validate(max_steps=san_check_val_step)

        start_step = int(jax.device_get(self.state.step))
        start_epoch = start_step // max(self.steps_per_epoch, 1)
        save_every = max(int(self.save_interval * self.steps_per_epoch), 1)
        profile_dir = self.params.get("profile_dir", "")
        profile_steps = self.params.get("profile_steps", (10, 15))
        # host-side step counter: a device_get of state.step every
        # iteration would sync the pipeline each step
        step = start_step
        t0 = time.time()
        for epoch in range(start_epoch, self.max_epochs):
            loader.set_epoch(epoch)
            # double-buffered device feed: host collate + H2D of batch i+1
            # overlap the device step on batch i (prefetch_to_device)
            for batch in prefetch_to_device(iter(loader), self.mesh):
                if profile_dir and step == profile_steps[0]:
                    jax.profiler.start_trace(profile_dir)
                self.state, metrics = self._train_step(self.state, batch)
                step += 1
                if profile_dir and step == profile_steps[1]:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                if self.max_steps > 0 and step >= self.max_steps:
                    print(f"[max_steps {self.max_steps} reached]")
                    self.save_checkpoint("last")
                    self.validate(max_steps=4)
                    self.wait_for_checkpoints()
                    return
                if step % self.print_iter == 0:
                    metrics = jax.device_get(metrics)
                    metrics = {k: float(v) for k, v in metrics.items()}
                    # schedule is indexed in optimizer steps (see __init__)
                    metrics["lr"] = float(self.lr_schedule(
                        step // self.grad_accum_steps))
                    metrics["epoch"] = epoch
                    dt = time.time() - t0
                    metrics["steps_per_sec"] = self.print_iter / max(dt, 1e-9)
                    t0 = time.time()
                    if jax.process_index() == 0:
                        print(f"[step {step}] " + " ".join(
                            f"{k}={v:.5g}" for k, v in metrics.items()
                            if not isinstance(v, str)))
                    self.logger.log(metrics, step)
                if step % save_every == 0:
                    self.save_checkpoint("last")
            if self.params.get("save_epoch_end", False):
                self.save_checkpoint(f"epoch{epoch + 1}")
            if (epoch + 1) % self.eval_interval == 0:
                self.validate()
        self.save_checkpoint("final")
        self.wait_for_checkpoints()

    def validate(self, max_steps=None):
        if self.state is None:
            batch = next(iter(self.datamodule.val_loader))
            self.state = self._init_state(shard_batch(batch, self.mesh))
        if self._eval_step is None:
            self._build_steps()
        meters: Dict[str, AverageMeter] = {}
        first_viz = None  # (np_batch, out) of the first eval batch
        n_data = int(np.prod(list(self.mesh.shape.values())))
        for i, batch in enumerate(self.datamodule.val_loader):
            if max_steps is not None and i >= max_steps:
                break
            np_batch = batch
            bs_i = next(iter(batch.values())).shape[0]
            idx = jnp.asarray(i, jnp.int32)
            if bs_i % n_data == 0:
                batch = shard_batch(batch, self.mesh)
                out, losses = self._eval_step(self.state, batch, idx)
            elif jax.process_count() == 1:
                # ragged remainder: replicate instead of sharding
                batch = jax.device_put(batch,
                                       replicated_sharding(self.mesh))
                out, losses = self._eval_step_rep(self.state, batch, idx)
            else:
                # multi-host: a ragged global batch cannot be assembled
                # from per-process strided shards; skip it (weighted
                # averages over full batches remain exact)
                if jax.process_index() == 0:
                    print(f"[val] skipped ragged batch {i} "
                          f"({bs_i} samples) on multi-host eval")
                continue
            losses = {k: float(v) for k, v in jax.device_get(losses).items()}
            out_np = None
            if self.host_metrics_fn is not None:
                out_np = jax.device_get(out)
                if jax.process_count() > 1:
                    # `out` is the GLOBAL batch output but np_batch is this
                    # host's LOCAL block (loader block shards, process-order
                    # assembly): slice out to the local rows, compute local
                    # metrics, then average across hosts — same estimator
                    # as a single process over the global batch
                    gb = bs_i * jax.process_count()
                    start = jax.process_index() * bs_i
                    out_local = jax.tree_util.tree_map(
                        lambda a: a[start:start + bs_i]
                        if hasattr(a, "shape") and a.shape and
                        a.shape[0] == gb else a, out_np)
                    local = self.host_metrics_fn(np_batch, out_local)
                    if local:
                        from jax.experimental import multihost_utils
                        keys = sorted(local)
                        vec = np.asarray([float(local[k]) for k in keys],
                                         np.float64)
                        gathered = multihost_utils.process_allgather(vec)
                        losses.update({k: float(v) for k, v in
                                       zip(keys, gathered.mean(axis=0))})
                    out_np = out_local
                else:
                    losses.update(self.host_metrics_fn(np_batch, out_np))
            if first_viz is None and self.viz_fn is not None:
                if out_np is None:
                    out_np = jax.device_get(out)
                    if jax.process_count() > 1:  # local rows (see above)
                        gb = bs_i * jax.process_count()
                        start = jax.process_index() * bs_i
                        out_np = jax.tree_util.tree_map(
                            lambda a: a[start:start + bs_i]
                            if hasattr(a, "shape") and a.shape and
                            a.shape[0] == gb else a, out_np)
                first_viz = (np_batch, out_np)
            bs = next(iter(np_batch.values())).shape[0]
            for k, v in losses.items():
                meters.setdefault(k, AverageMeter()).update(v, bs)
        results = {f"val/{k}": m.avg for k, m in meters.items()}
        step = int(jax.device_get(self.state.step))
        if jax.process_index() == 0 and results:
            print(f"[val @ step {step}] " + " ".join(
                f"{k}={v:.5g}" for k, v in results.items()))
            self.logger.log(results, step)
        if (first_viz is not None and self.ckp_path and
                jax.process_index() == 0 and
                self.params.get("use_viz", True)):
            viz_dir = os.path.join(self.ckp_path, "viz")
            try:
                self.viz_fn(self, first_viz[0], first_viz[1], step, viz_dir)
            except Exception as e:  # viz must never kill training
                print(f"[viz] skipped: {type(e).__name__}: {e}")
        return results
