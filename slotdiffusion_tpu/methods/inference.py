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
