"""Epoch-end visual logging.

The reference logs reconstruction grids, per-slot images, denoising rows
and rollout-vs-GT videos to wandb every epoch (img_based/method.py:110-127,
320-376; video_based/method.py:132-151; vp_vqa/method.py:280-321). Here a
host-side callback runs on the first val batch of every `Trainer.validate`
(rank 0 only, wired via `Trainer.viz_fn`): PNG grids / mp4 strips are
written under `<ckp_path>/viz/` and mirrored to wandb when enabled.

All image assembly is numpy; the only device compute is the (jitted,
cached) diffusion sampler / rollout decoder for the generative families.
"""

import os

import numpy as np

import jax

from ..utils import vis
from ..utils.misc import mkdir_or_exist, save_image, save_video


# ----------------------------------------------------------------------
# small host-side helpers
# ----------------------------------------------------------------------


def _u8(img):
    """[-1,1]/[0,1] float or uint8 [H, W, 3] -> uint8."""
    return vis._to_uint8(np.asarray(img))


def _resize_ids(ids, out_hw):
    """Nearest-resize an integer id map [h, w] -> [H, W]."""
    h, w = ids.shape
    H, W = out_hw
    ri = (np.arange(H) * h) // H
    ci = (np.arange(W) * w) // W
    return ids[ri][:, ci]


def _overlay(img, soft_masks):
    """img [H, W, 3]; soft_masks [N, h, w(, 1)] -> uint8 overlay."""
    m = np.asarray(soft_masks)
    if m.ndim == 4 and m.shape[-1] == 1:
        m = m[..., 0]
    ids = m.argmax(axis=0)
    if ids.shape != img.shape[:2]:
        ids = _resize_ids(ids, img.shape[:2])
    return vis.draw_mask(img, ids)


def _save(trainer, tag, img, step, viz_dir, fps=None):
    """Write one PNG (or mp4 when fps is set) and mirror to wandb."""
    mkdir_or_exist(viz_dir)
    if fps is not None:
        path = os.path.join(viz_dir, f"step{step}_{tag}.mp4")
        # save_video falls back to .gif when no mp4 backend exists
        path = save_video(np.asarray(img).astype(np.uint8), path, fps=fps)
    else:
        path = os.path.join(viz_dir, f"step{step}_{tag}.png")
        save_image(np.asarray(img).astype(np.uint8), path)
    wandb = getattr(trainer.logger, "_wandb", None)
    if wandb is not None:
        key = f"viz/{tag}"
        media = wandb.Video(path) if fps is not None else wandb.Image(path)
        wandb.log({key: media}, step=int(step))
    return path


def _frames_strip(frames):
    """[T, H, W, 3] uint8 -> one [H, T*W, 3] horizontal strip."""
    return np.concatenate(list(frames), axis=1)


def _stack_rows(rows, pad=2):
    """List of [H, W, 3] uint8 (same W) -> vertically stacked grid."""
    W = max(r.shape[1] for r in rows)
    padded = []
    for r in rows:
        if r.shape[1] < W:
            r = np.pad(r, ((0, 0), (0, W - r.shape[1]), (0, 0)),
                       constant_values=255)
        padded.append(r)
        padded.append(np.full((pad, W, 3), 255, np.uint8))
    return np.concatenate(padded[:-1], axis=0)


def _jit_cached(trainer, key, fn):
    cache = trainer.__dict__.setdefault("_viz_jit_cache", {})
    if key not in cache:
        cache[key] = jax.jit(fn)
    return cache[key]


# ----------------------------------------------------------------------
# per-family callbacks: (trainer, np_batch, out_np, step, viz_dir)
# ----------------------------------------------------------------------


def viz_sa_image(trainer, np_batch, out, step, viz_dir, n=8):
    """SA/SADiffusion-style image grids: GT | recon/sample | mask overlay,
    plus a per-slot row for the first image (img_based/method.py:110-127)."""
    img = np.asarray(np_batch["img"][:n])
    rows = []
    gt_row = _frames_strip(np.stack([_u8(im) for im in img]))
    rows.append(gt_row)
    if "recon_img" in out:
        rows.append(_frames_strip(
            np.stack([_u8(im) for im in np.asarray(out["recon_img"][:n])])))
    if "masks" in out:
        masks = np.asarray(out["masks"][:n])
        rows.append(_frames_strip(np.stack(
            [_overlay(img[b], masks[b]) for b in range(img.shape[0])])))
    _save(trainer, "recon", _stack_rows(rows), step, viz_dir)
    # per-slot decomposition of the first image (recons [B, N, H, W, 3])
    if "recons" in out:
        slots_row = np.stack([_u8(s) for s in np.asarray(out["recons"][0])])
        _save(trainer, "slots", _frames_strip(slots_row), step, viz_dir)


def viz_savi_video(trainer, np_batch, out, step, viz_dir):
    """SAVi-family first-video strips: GT / recon / overlay rows with frames
    along columns, plus an mp4 (video_based/method.py:132-151)."""
    img = np.asarray(np_batch["img"][0])  # [T, H, W, 3]
    T = img.shape[0]
    rows = [_frames_strip(np.stack([_u8(f) for f in img]))]
    if "recon_img" in out:
        rec = np.asarray(out["recon_img"][0])
        rows.append(_frames_strip(np.stack([_u8(f) for f in rec])))
    overlay = None
    if "masks" in out:
        masks = np.asarray(out["masks"][0])  # [T, N, h, w(, 1)]
        overlay = np.stack(
            [_overlay(img[t], masks[t]) for t in range(T)])
        rows.append(_frames_strip(overlay))
    _save(trainer, "video", _stack_rows(rows), step, viz_dir)
    if overlay is not None:
        _save(trainer, "video_overlay", overlay, step, viz_dir, fps=8)


def viz_diffusion_image(trainer, np_batch, out, step, viz_dir, n=4):
    """SADiffusion: DPM-decoded samples + denoise row via the model's
    log_images (img_based/method.py:320-376)."""
    model = trainer.model
    sub = {"img": jax.numpy.asarray(np.asarray(np_batch["img"][:n]))}
    denoise_row = trainer.params.get("viz_denoise_rows", True)

    def sample_fn(params, batch, rng):
        return model.apply(
            {"params": params}, batch, rng,
            use_dpm=trainer.params.get("use_dpm", True),
            same_noise=trainer.params.get("same_noise", False),
            ret_intermed=denoise_row,
            rngs={"diffusion": rng}, method=model.log_images)

    fn = _jit_cached(trainer, "sample_img", sample_fn)
    res = jax.device_get(
        fn(trainer.state.params, sub, jax.random.PRNGKey(step)))
    img = np.asarray(np_batch["img"][:n])
    rows = [_frames_strip(np.stack([_u8(im) for im in img])),
            _frames_strip(np.stack([_u8(im) for im in res["samples"]]))]
    masks = np.asarray(res["masks"])
    rows.append(_frames_strip(np.stack(
        [_overlay(img[b], masks[b]) for b in range(img.shape[0])])))
    _save(trainer, "samples", _stack_rows(rows), step, viz_dir)
    if res.get("intermed") is not None:
        # [K, B, H, W, 3]: one row per logged denoise step, first image
        row = np.stack([_u8(f) for f in res["intermed"][:, 0]])
        _save(trainer, "denoise_row", _frames_strip(row), step, viz_dir)


def viz_diffusion_video(trainer, np_batch, out, step, viz_dir, n=2):
    """SAViDiffusion: same_noise DPM-decoded video vs GT + mask overlays
    (video_based/method.py:440-457)."""
    model = trainer.model
    sub = {"img": jax.numpy.asarray(np.asarray(np_batch["img"][:n]))}

    def sample_fn(params, batch, rng):
        return model.apply(
            {"params": params}, batch, rng,
            use_dpm=trainer.params.get("use_dpm", True),
            same_noise=trainer.params.get("same_noise", True),
            rngs={"diffusion": rng}, method=model.log_images)

    fn = _jit_cached(trainer, "sample_vid", sample_fn)
    res = jax.device_get(
        fn(trainer.state.params, sub, jax.random.PRNGKey(step)))
    img = np.asarray(np_batch["img"][0])  # [T, H, W, 3]
    T = img.shape[0]
    samples = np.asarray(res["samples"][0])
    masks = np.asarray(res["masks"][0])
    rows = [
        _frames_strip(np.stack([_u8(f) for f in img])),
        _frames_strip(np.stack([_u8(f) for f in samples])),
        _frames_strip(np.stack(
            [_overlay(img[t], masks[t]) for t in range(T)])),
    ]
    _save(trainer, "video_samples", _stack_rows(rows), step, viz_dir)
    _save(trainer, "video_samples", np.stack(
        [_u8(f) for f in samples]), step, viz_dir, fps=8)


def viz_slate(trainer, np_batch, out, step, viz_dir):
    """SLATE/STEVE: mask overlays (+ soft recon when the pixel loss is on).
    AR generation is skipped during training, like the reference's STEVE
    method (video_based/method.py:200-214)."""
    img = np.asarray(np_batch["img"])
    if img.ndim == 5:  # video: first sample, frames as columns
        img0 = img[0]
        masks = np.asarray(out["masks"][0])
        rows = [_frames_strip(np.stack([_u8(f) for f in img0])),
                _frames_strip(np.stack(
                    [_overlay(img0[t], masks[t])
                     for t in range(img0.shape[0])]))]
        if "recon_img" in out:
            rec = np.asarray(out["recon_img"]).reshape(img.shape)[0]
            rows.insert(1, _frames_strip(
                np.stack([_u8(f) for f in rec])))
    else:
        n = min(8, img.shape[0])
        masks = np.asarray(out["masks"][:n])
        rows = [_frames_strip(np.stack([_u8(im) for im in img[:n]])),
                _frames_strip(np.stack(
                    [_overlay(img[b], masks[b]) for b in range(n)]))]
        if "recon_img" in out:
            rec = np.asarray(out["recon_img"][:n])
            rows.insert(1, _frames_strip(
                np.stack([_u8(im) for im in rec])))
    _save(trainer, "masks", _stack_rows(rows), step, viz_dir)


def viz_recon_pairs(trainer, np_batch, out, step, viz_dir, n=8,
                    recon_key="recon"):
    """VQ-VAE / dVAE: GT | recon grid (vqvae loss curves are scalar; the
    reference logs recon grids every epoch, img_based/method.py:110-127)."""
    img = np.asarray(np_batch["img"])
    rec = np.asarray(out[recon_key])
    if img.ndim == 5:  # temporal wrapper folds T into batch
        img = img.reshape(-1, *img.shape[2:])
    if rec.ndim == 5:
        rec = rec.reshape(-1, *rec.shape[2:])
    n = min(n, img.shape[0], rec.shape[0])
    rows = [_frames_strip(np.stack([_u8(im) for im in img[:n]])),
            _frames_strip(np.stack([_u8(im) for im in rec[:n]]))]
    _save(trainer, "recon", _stack_rows(rows), step, viz_dir)


def viz_slotformer(trainer, np_batch, out, step, viz_dir, n=1):
    """SlotFormer/LDMSlotFormer: decoded rollout vs GT frames
    (vp_vqa/method.py:280-321). Decodes history+rollout with the (frozen)
    decoder; GT pixels come from the batch when the dataset provides them,
    otherwise only the decoded rollout strip is saved."""
    model = trainer.model
    # decoder-less rollouters (e.g. Physion readout precursors) can't be
    # visualized in pixel space
    if not trainer.params.get("dec_dict", None):
        return
    slots = np.asarray(np_batch["slots"][:n])
    # setup()-assigned fields are only visible inside init/apply; the
    # config dict is the module attribute
    history_len = model.rollout_dict["history_len"]
    rollout_len = slots.shape[1] - history_len
    is_ldm = trainer.params.model == "LDMSlotFormer"

    def rollout_fn(params, past, rng):
        if is_ldm:  # LDM decode consumes the sampling rng
            return model.apply(
                {"params": params}, past, rollout_len, True, True, rng,
                rngs={"diffusion": rng}, method=model.rollout)
        return model.apply(
            {"params": params}, past, rollout_len, True, True,
            rngs={"diffusion": rng}, method=model.rollout)

    fn = _jit_cached(trainer, "rollout", rollout_fn)
    past = jax.numpy.asarray(slots[:, :history_len])
    res = jax.device_get(fn(trainer.state.params, past,
                            jax.random.PRNGKey(step)))
    frames = np.asarray(res["recon_combined"][0])  # [T, H, W, 3]
    pred_row = np.stack([_u8(f) for f in frames])
    rows = []
    if "img" in np_batch:
        gt = np.asarray(np_batch["img"][0][:frames.shape[0]])
        rows.append(_frames_strip(np.stack([_u8(f) for f in gt])))
    rows.append(_frames_strip(pred_row))
    _save(trainer, "rollout", _stack_rows(rows), step, viz_dir)
    _save(trainer, "rollout", pred_row, step, viz_dir, fps=8)


# ----------------------------------------------------------------------
# dispatch
# ----------------------------------------------------------------------

_VIZ_FNS = {
    "SA": viz_sa_image,
    "SAVi": viz_savi_video,
    "SADiffusion": viz_diffusion_image,
    "SAViDiffusion": viz_diffusion_video,
    "SLATE": viz_slate,
    "STEVE": viz_slate,
    "VQVAE": viz_recon_pairs,
    "dVAE": viz_recon_pairs,
    "DVAE": viz_recon_pairs,
    "SlotFormer": viz_slotformer,
    "LDMSlotFormer": viz_slotformer,
}


def build_viz_fn(params):
    """Return the epoch-end viz callback for `params.model`, or None."""
    fn = _VIZ_FNS.get(params.model)
    if fn is None:
        return None

    def viz_fn(trainer, np_batch, out_np, step, viz_dir):
        fn(trainer, np_batch, out_np, step, viz_dir)

    return viz_fn
