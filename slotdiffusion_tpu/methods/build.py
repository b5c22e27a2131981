"""Method layer: per-model Trainer configuration.

The analog of the reference's method classes (img_based/method.py,
video_based/method.py, vp_vqa/method.py): instead of subclassing a trainer,
each model family contributes its hooks to a generic Trainer —

- dual-LR param groups for the DM/transformer decoder
  (img_based/method.py:133-172, 235-285): `lr_groups`
- dVAE gumbel tau cosine annealing (video_based/method.py:549-567):
  a `step_scalars['gumbel_tau']` schedule evaluated from state.step
- SlotFormer loss-decay warmup (vp_vqa/method.py:188-210):
  `step_scalars['loss_decay_factor']`
- segmentation metrics on eval batches with GT masks
  (savi.py:517-560): a host-side metrics callback
"""

import numpy as np

from ..ops import metrics as M
from ..training.trainer import Trainer
from ..models.blocks import cosine_anneal
from .viz import build_viz_fn


def _mask_metrics(gt, pred_id, overlap=None, prefix=""):
    p = f"{prefix}/" if prefix else ""
    return {
        f"{p}ari": M.ARI_metric(gt, pred_id, overlap),
        f"{p}fari": M.fARI_metric(gt, pred_id, overlap),
        f"{p}miou": M.miou_metric(gt, pred_id, overlap),
        f"{p}fmiou": M.fmiou_metric(gt, pred_id, overlap),
        f"{p}mbo": M.mbo_metric(gt, pred_id, overlap),
    }


def seg_metrics_fn(np_batch, out):
    """ARI/FG-ARI/mIoU/FG-mIoU/mBO from predicted soft masks vs GT int masks.

    Handles images ([B, N, H, W(, 1)] masks) and videos ([B, T, N, H, W(, 1)])
    — videos fold T into space for temporal consistency (savi.py:517-522).

    COCO/VOC dual protocol (reference img_based/test_seg.py:45-89): when the
    batch carries `inst_masks`, every metric is computed TWICE — against the
    instance masks (`inst/*`) and the semantic masks (`sem/*`) — and COCO's
    `overlap_masks` (pixels covered by >1 instance) are passed into the
    metrics so the DINOSAUR overlap-exclusion preprocessing
    (img_based/models/eval_utils.py:119-135) applies to both.
    """
    if "masks" not in np_batch or "masks" not in out:
        return {}
    pred = np.asarray(out["masks"])
    gt = np.asarray(np_batch["masks"]).astype(np.int64)
    if pred.shape[-1] == 1:
        pred = pred[..., 0]
    # pred is now [B, N, H, W] or [B, T, N, H, W] soft masks
    pred_id = pred.argmax(axis=-3)  # argmax over slot dim
    if pred_id.ndim == 4:  # video: [B, T, H, W] -> fold T into H
        B, T, H, W = pred_id.shape
        pred_id = pred_id.reshape(B, T * H, W)
        gt = gt.reshape(B, T * H, W)
    if "inst_masks" in np_batch:
        inst = np.asarray(np_batch["inst_masks"]).astype(np.int64)
        overlap = np_batch.get("overlap_masks", None)
        if overlap is not None:
            overlap = np.asarray(overlap).astype(np.int64)
        res = _mask_metrics(inst, pred_id, overlap, prefix="inst")
        res.update(_mask_metrics(gt, pred_id, overlap, prefix="sem"))
        return res
    return _mask_metrics(gt, pred_id)


def build_method(model, datamodule, params, ckp_path=None, **kwargs):
    """Build a configured Trainer for the given model/config."""
    model_name = params.model
    step_scalars = {}
    lr_groups = params.get("lr_groups", None)
    host_metrics = None

    steps_per_epoch = len(datamodule.train_loader) \
        if datamodule.train_loader is not None else 1
    total_steps = params.max_epochs * steps_per_epoch

    if model_name in ("SA", "SAVi", "SADiffusion", "SAViDiffusion", "SLATE",
                      "STEVE"):
        host_metrics = seg_metrics_fn

    if model_name in ("SADiffusion", "SAViDiffusion") and lr_groups is None:
        dec_lr = params.get("dec_lr", None)
        if dec_lr is not None and dec_lr != params.lr:
            lr_groups = {"dm_decoder": dec_lr}
    if model_name in ("SLATE", "STEVE") and lr_groups is None:
        dec_lr = params.get("dec_lr", None)
        if dec_lr is not None and dec_lr != params.lr:
            lr_groups = {"trans_decoder": dec_lr}
    if lr_groups is not None:
        params.lr_groups = lr_groups

    if model_name in ("dVAE", "DVAE"):
        # tau anneal: start 1.0 -> final 0.1 over 30% of training
        # (video_based/method.py:549-567 semantics, config-driven)
        tau_start = params.get("init_tau", 1.0)
        tau_final = params.get("final_tau", 0.1)
        tau_steps = params.get("tau_decay_pct", 0.3) * total_steps
        step_scalars["gumbel_tau"] = lambda step: cosine_anneal(
            step, tau_start, tau_final, 0, tau_steps)

    if model_name in ("SlotFormer", "LDMSlotFormer") and \
            params.get("use_loss_decay", False):
        # loss decay warmup (vp_vqa/method.py:188-210, gated by
        # use_loss_decay): factor ramps from min to 1.0 over decay_pct
        decay_min = params.get("loss_decay_min", 0.1)
        decay_pct = params.get("loss_decay_pct", 0.2)
        decay_steps = decay_pct * total_steps
        step_scalars["loss_decay_factor"] = lambda step: cosine_anneal(
            step, decay_min, 1.0, 0, decay_steps)

    # params.seed must reach the Trainer's init/RNG seed, not just the
    # loader shuffle — the dup_run seed-duplication protocol
    # (dup_run_tpu.sh, reference dup_run_sbatch.sh:27-36) varies the
    # whole run, matching nerv's global torch seeding
    kwargs.setdefault("seed", params.get("seed", 0))
    return Trainer(
        model=model,
        datamodule=datamodule,
        params=params,
        ckp_path=ckp_path,
        step_scalars=step_scalars or None,
        host_metrics_fn=host_metrics,
        viz_fn=kwargs.pop("viz_fn", build_viz_fn(params)),
        **kwargs,
    )
