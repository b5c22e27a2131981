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
