"""Chunked full-video inference with slot carry-over.

The reference processes arbitrarily long videos by probing for OOM and
halving the batch (video_based/models/savi.py:402-443). On TPU, dynamic
shapes force recompiles, so instead long videos are processed in
fixed-length chunks: each chunk is one static-shape jitted call, the last
frame's slots seed the next chunk's predictor (`prev_slots`), and the tail
chunk is padded by repeating its last frame (outputs for padded frames are
dropped host-side).

Shared by `scripts/extract_slots.py`, `scripts/test_seg.py` and
`scripts/test_recon.py` so every full-video eval uses the same carry logic.
"""

import numpy as np

import jax


def chunked_video_apply(apply_fn, img, clip_len, carry_key="slots",
                        keys=None):
    """Run `apply_fn` over a long video in static-shape chunks.

    Args:
        apply_fn: callable `(img_chunk, prev_slots) -> dict` where
            `img_chunk` is [B, clip_len, H, W, 3], `prev_slots` is
            [B, N, D] or None (first chunk), and every returned entry is
            time-major [B, clip_len, ...]. Typically a `jax.jit`-wrapped
            model apply — passing `prev_slots=None` vs an array yields two
            compiled specializations, both static-shape.
        img: [B, T, H, W, 3] numpy/jax array, any T >= 1.
        clip_len: static chunk length (the training clip length).
        carry_key: output key whose last frame seeds the next chunk.
        keys: optional iterable restricting which output keys to gather.

    Returns:
        dict of numpy arrays, each [B, T, ...] — chunk outputs concatenated
        along time with pad frames removed.
    """
    T = img.shape[1]
    gathered = []
    prev = None
    for s in range(0, T, clip_len):
        chunk = np.asarray(img[:, s:s + clip_len])
        pad = clip_len - chunk.shape[1]
        if pad > 0:  # static shapes: repeat the last frame into the pad
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[:, -1:], pad, axis=1)], axis=1)
        out = apply_fn(chunk, prev)
        out = {k: np.asarray(v) for k, v in jax.device_get(out).items()
               if v is not None and (keys is None or k in keys)}
        valid = clip_len - pad
        out = {k: v[:, :valid] for k, v in out.items()}
        gathered.append(out)
        prev = out[carry_key][:, -1]
    return {k: np.concatenate([o[k] for o in gathered], axis=1)
            for k in gathered[0]}


def interleaved_rollout(slots, rollout_fn, obs_frames, history_len,
                        frame_offset):
    """Frame-offset-interleaved slot rollout (vp_vqa/rollout_physion_slots
    .py:39-56).

    `slots`: [B, T, N, C] full-video GT slots. For a model trained with
    `frame_offset` k, the reference rolls out k strided subsequences
    ([s, s+k, s+2k, ...] for each offset, where s places exactly
    `history_len` observed frames before the first predicted one) and
    re-interleaves the per-offset predictions into consecutive frames.
    `rollout_fn(past [B, history_len, N, C], pred_len) -> [B, pred_len,
    N, C]` is the jitted SlotFormer rollout; all offsets share one
    compiled shape. Returns [B, T, N, C]: observed burn-in frames
    followed by predicted frames.
    """
    video_len = slots.shape[1]
    total_pred = video_len - obs_frames
    assert total_pred > 0, (
        f"video_len={video_len} <= obs_frames={obs_frames}")
    obs = slots[:, :obs_frames]
    if frame_offset == 1:
        pred = np.asarray(rollout_fn(obs[:, -history_len:], total_pred))
    else:
        all_pred = []
        for off in range(frame_offset):
            start = obs_frames - history_len * frame_offset + off
            assert start >= 0, (
                f"obs_frames={obs_frames} too short for history_len="
                f"{history_len} x frame_offset={frame_offset}")
            in_slots = slots[:, start::frame_offset]
            past = in_slots[:, :history_len]
            pred_len = in_slots.shape[1] - history_len
            all_pred.append(np.asarray(rollout_fn(past, pred_len)))
        pred = np.stack([
            all_pred[i % frame_offset][:, i // frame_offset]
            for i in range(total_pred)
        ], axis=1)
    return np.concatenate([obs, pred], axis=1)
