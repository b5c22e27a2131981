"""Chunked full-video inference helper (methods/inference.py).

Validates the static-chunk + slot-carry contract that replaces the
reference's OOM-probing full-video forward (video_based/models/savi.py:
402-443): tail padding is dropped, the carry is the previous chunk's last
frame, and outputs concatenate to the full video length.
"""

import numpy as np
import pytest

from slotdiffusion_tpu.methods.inference import chunked_video_apply

pytestmark = pytest.mark.fast


def _make_apply(record):
    """Fake model: slots[b, t] = img frame mean + 1000 * (prev is not None).

    Records every (chunk_shape, prev) pair so the test can assert the
    chunking/carry sequence exactly.
    """

    def apply_fn(img, prev):
        record.append((img.shape, None if prev is None else prev.copy()))
        B, T = img.shape[:2]
        base = img.mean(axis=(2, 3, 4), keepdims=False)  # [B, T]
        slots = np.tile(base[:, :, None, None], (1, 1, 3, 4))
        if prev is not None:
            slots = slots + 1000.0
        return {"slots": slots, "masks": np.ones((B, T, 3, 8, 8)),
                "unused": None}

    return apply_fn


def test_chunked_shapes_and_tail_pad():
    B, T, clip = 2, 13, 5
    img = np.random.RandomState(0).rand(B, T, 8, 8, 3).astype(np.float32)
    record = []
    out = chunked_video_apply(_make_apply(record), img, clip)
    assert out["slots"].shape == (B, T, 3, 4)
    assert out["masks"].shape == (B, T, 3, 8, 8)
    assert "unused" not in out
    # 13 frames -> chunks of 5, 5, 5(padded from 3)
    assert [r[0][1] for r in record] == [clip, clip, clip]
    # first chunk has no carry; later chunks carry the previous last frame
    assert record[0][1] is None
    np.testing.assert_allclose(record[1][1], out["slots"][:, 4])
    np.testing.assert_allclose(record[2][1], out["slots"][:, 9])


def test_chunked_values_match_unchunked_when_divisible():
    B, T, clip = 1, 6, 6
    img = np.random.RandomState(1).rand(B, T, 4, 4, 3).astype(np.float32)
    record = []
    out = chunked_video_apply(_make_apply(record), img, clip)
    # one chunk, no pad, no carry: values are plain frame means
    expect = img.mean(axis=(2, 3, 4))
    np.testing.assert_allclose(out["slots"][:, :, 0, 0], expect, rtol=1e-6)
    assert len(record) == 1


def test_keys_filter():
    img = np.zeros((1, 4, 4, 4, 3), np.float32)
    out = chunked_video_apply(_make_apply([]), img, 2, keys=("slots",))
    assert set(out) == {"slots"}


class _MockRollout:
    """pred[b, j] = past[b, -1] + (j+1) * stride-marker.

    Marks each prediction with the gap between its past frames so the
    interleave test can verify which strided subsequence produced it.
    """

    def __init__(self):
        self.calls = []

    def __call__(self, past, pred_len):
        self.calls.append((past.shape, pred_len))
        B, H, N, C = past.shape
        stride = past[:, -1] - past[:, -2]  # constant for arange inputs
        steps = np.arange(1, pred_len + 1).reshape(1, pred_len, 1, 1)
        return past[:, -1:] + steps * stride[:, None]


def test_interleaved_rollout_offset1_matches_plain():
    from slotdiffusion_tpu.methods.inference import interleaved_rollout
    B, T, N, C = 2, 10, 3, 4
    slots = np.arange(T, dtype=np.float32).reshape(1, T, 1, 1) * np.ones(
        (B, T, N, C), np.float32)
    fn = _MockRollout()
    out = interleaved_rollout(slots, fn, obs_frames=6, history_len=4,
                              frame_offset=1)
    assert out.shape == (B, T, N, C)
    # obs part is GT; pred continues the arithmetic sequence exactly
    np.testing.assert_allclose(out, slots)
    assert fn.calls == [((B, 4, N, C), 4)]


def test_interleaved_rollout_offset3_reference_semantics():
    """frame_offset=3 reproduces rollout_physion_slots.py:41-56: offset k
    rollouts see strided pasts [start::3] and predictions interleave back
    to consecutive frames."""
    from slotdiffusion_tpu.methods.inference import interleaved_rollout
    B, N, C = 1, 2, 2
    T, obs, hist, off = 24, 9, 3, 3
    slots = np.arange(T, dtype=np.float32).reshape(1, T, 1, 1) * np.ones(
        (B, T, N, C), np.float32)
    fn = _MockRollout()
    out = interleaved_rollout(slots, fn, obs_frames=obs, history_len=hist,
                              frame_offset=off)
    assert out.shape == (B, T, N, C)
    # each strided subsequence has constant stride 3, so the mock's
    # prediction continues the GT sequence exactly -> interleave is exact
    np.testing.assert_allclose(out, slots)
    # three calls, one per offset; past always [B, hist, N, C], and the
    # strided subsequences start at obs - hist*off + off_idx = 0, 1, 2
    assert [c[0] for c in fn.calls] == [(B, hist, N, C)] * off
    assert [c[1] for c in fn.calls] == [
        len(range(s, T, off)) - hist for s in (0, 1, 2)]


def test_interleaved_rollout_ragged_offsets():
    """When total_pred isn't divisible by frame_offset, later offsets
    predict one fewer frame and the interleave still lines up."""
    from slotdiffusion_tpu.methods.inference import interleaved_rollout
    B, N, C = 1, 1, 1
    T, obs, hist, off = 13, 6, 2, 2  # total_pred=7 -> per-offset 4 and 3
    slots = np.arange(T, dtype=np.float32).reshape(1, T, 1, 1) * np.ones(
        (B, T, N, C), np.float32)
    out = interleaved_rollout(slots, _MockRollout(), obs_frames=obs,
                              history_len=hist, frame_offset=off)
    np.testing.assert_allclose(out, slots)
