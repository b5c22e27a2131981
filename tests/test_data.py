"""Data layer: loader semantics, transforms, native fastio, MOVi layout.

The reference has no tests for its datasets; these pin the behaviors the
rebuild depends on: deterministic sharded batching, corrupted-sample
retry (_rand_another analog, movi.py:54-60), mask id suppression, and the
native decode path's parity with PIL.
"""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from slotdiffusion_tpu.data.loader import DataLoader, Dataset, SampleError
from slotdiffusion_tpu.data.transforms import (BaseTransforms,
                                               suppress_mask_idx)

pytestmark = pytest.mark.fast


class _ToyDataset(Dataset):
    def __init__(self, n=32, bad=()):
        self.n = n
        self.bad = set(bad)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if idx in self.bad:
            raise SampleError("corrupted")
        return {"img": np.full((4, 4, 3), idx, np.float32),
                "data_idx": np.int32(idx)}


def test_loader_covers_all_indices_once():
    loader = DataLoader(_ToyDataset(32), batch_size=8, shuffle=True,
                        num_workers=2, seed=0)
    seen = []
    for batch in loader:
        assert batch["img"].shape == (8, 4, 4, 3)
        seen.extend(batch["data_idx"].tolist())
    assert sorted(seen) == list(range(32))


def test_loader_shuffle_deterministic_per_epoch():
    mk = lambda: DataLoader(_ToyDataset(32), batch_size=8, shuffle=True,
                            num_workers=1, seed=3)
    e1 = [b["data_idx"].tolist() for b in mk()]
    e2 = [b["data_idx"].tolist() for b in mk()]
    assert e1 == e2
    ldr = mk()
    first = [b["data_idx"].tolist() for b in ldr]
    ldr.set_epoch(1)  # epoch advance is explicit (trainer calls set_epoch)
    second = [b["data_idx"].tolist() for b in ldr]
    assert first != second
    assert sorted(sum(first, [])) == sorted(sum(second, []))


def test_loader_host_sharding_partitions_batch():
    full, shards = [], [[], []]
    for b in DataLoader(_ToyDataset(32), batch_size=8, shuffle=True,
                        num_workers=1, seed=5):
        full.append(b["data_idx"].tolist())
    for p in (0, 1):
        for b in DataLoader(_ToyDataset(32), batch_size=8, shuffle=True,
                            num_workers=1, seed=5, process_index=p,
                            process_count=2):
            assert b["img"].shape[0] == 4  # local shard of the global batch
            shards[p].append(b["data_idx"].tolist())
    for i, gb in enumerate(full):
        # contiguous blocks in process order: the concatenation must equal
        # the single-host global batch EXACTLY (not just as a set) — this
        # is what makes a multi-host fit loss-identical to a single-host
        # fit of the same global batch (loader.py:_epoch_indices)
        assert shards[0][i] + shards[1][i] == gb


def test_loader_retries_corrupt_samples():
    loader = DataLoader(_ToyDataset(16, bad=(3, 7)), batch_size=4,
                        shuffle=False, num_workers=1, seed=0)
    seen = []
    for b in loader:
        seen.extend(b["data_idx"].tolist())
    assert len(seen) == 16
    assert 3 not in seen and 7 not in seen  # resampled to other indices


class _BrokenDataset(_ToyDataset):
    def __getitem__(self, idx):
        if idx == 5:
            raise ValueError("hard failure, not a SampleError")
        return super().__getitem__(idx)


def test_loader_process_mode_matches_thread_mode():
    # spawn-based worker processes (torch num_workers analog) must produce
    # the identical deterministic batch stream as the threaded loader
    mk = lambda mode: DataLoader(_ToyDataset(32), batch_size=8, shuffle=True,
                                 num_workers=2, seed=3, worker_mode=mode)
    thread_epoch = [b["data_idx"].tolist() for b in mk("thread")]
    proc_epoch = [b["data_idx"].tolist() for b in mk("process")]
    assert thread_epoch == proc_epoch


def test_loader_process_mode_retries_and_shards():
    loader = DataLoader(_ToyDataset(16, bad=(3, 7)), batch_size=4,
                        shuffle=False, num_workers=2, seed=0,
                        process_index=1, process_count=2,
                        worker_mode="process")
    seen = []
    for b in loader:
        assert b["img"].shape[0] == 2
        seen.extend(b["data_idx"].tolist())
    assert len(seen) == 8
    assert 3 not in seen and 7 not in seen


def test_loader_process_mode_propagates_worker_exception():
    loader = DataLoader(_BrokenDataset(16), batch_size=4, shuffle=False,
                        num_workers=2, seed=0, worker_mode="process")
    with pytest.raises(RuntimeError, match="hard failure"):
        list(loader)


def test_suppress_mask_idx():
    m = np.array([[0, 5], [9, 5]])
    out = suppress_mask_idx(m)
    assert out.tolist() == [[0, 1], [2, 1]]


def test_transforms_normalize_and_mask_nearest():
    tr = BaseTransforms((8, 8))
    img = (np.arange(16 * 16 * 3) % 256).reshape(16, 16, 3).astype(np.uint8)
    out = tr(img)
    assert out.shape == (8, 8, 3) and out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    mask = np.arange(16 * 16).reshape(16, 16) % 7
    m = tr.process_mask(mask)
    assert m.shape == (8, 8) and m.dtype == np.int32
    assert set(np.unique(m)) <= set(np.unique(mask))


def test_fastio_decode_matches_pil(tmp_path):
    from slotdiffusion_tpu.data.fastio import (decode_jpeg_norm,
                                               fastio_available)
    if not fastio_available():
        pytest.skip("native fastio not built")
    r = np.random.RandomState(0)
    # smooth image (JPEG-friendly) so codec differences stay tiny
    base = r.rand(8, 10, 3)
    img = np.kron(base, np.ones((32, 32, 1)))  # 256x320
    img = (img * 255).astype(np.uint8)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(img).save(p, quality=95)
    out = decode_jpeg_norm(p, (128, 128))
    ref = Image.open(p).convert("RGB").resize((128, 128), Image.BILINEAR)
    ref = (np.asarray(ref, np.float32) / 255.0 - 0.5) / 0.5
    assert np.abs(out - ref).mean() < 0.01


def test_fastio_png_mask_matches_pil(tmp_path):
    """Native PNG mask decode+nearest-resize == the PIL path for
    grayscale id masks; RGB/palette masks return None (PIL fallback)."""
    from slotdiffusion_tpu.data.fastio import (decode_png_mask,
                                               fastio_available)
    if not fastio_available():
        pytest.skip("native fastio not built")
    r = np.random.RandomState(1)
    ids = r.randint(0, 11, (64, 48)).astype(np.uint8)
    p = str(tmp_path / "m.png")
    Image.fromarray(ids, mode="L").save(p)

    out = decode_png_mask(p, (64, 48))
    np.testing.assert_array_equal(out, ids)  # no-resize roundtrip

    out = decode_png_mask(p, (32, 24))
    tr = BaseTransforms((32, 24))
    ref = tr.process_mask(ids)
    np.testing.assert_array_equal(out.astype(np.int32), ref)

    # transforms.load_mask wraps the same path
    lm = tr.load_mask(p)
    assert lm is not None and lm.dtype == np.int32
    np.testing.assert_array_equal(lm, ref)

    # RGB-coded mask must NOT be luminance-mixed: fastio refuses
    rgb = np.stack([ids, ids * 3, ids * 7], -1).astype(np.uint8)
    p_rgb = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(p_rgb)
    assert decode_png_mask(p_rgb, (32, 24)) is None
    assert tr.load_mask(p_rgb) is None


def test_fastio_png_rgb_norm_matches_pil(tmp_path):
    from slotdiffusion_tpu.data.fastio import (decode_png_norm,
                                               fastio_available)
    if not fastio_available():
        pytest.skip("native fastio not built")
    r = np.random.RandomState(2)
    img = (r.rand(24, 20, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    out = decode_png_norm(p)
    ref = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_movi_dataset_from_generated_layout(tmp_path):
    from slotdiffusion_tpu.data.movi import build_movi_dataset
    from slotdiffusion_tpu.utils import BaseParams

    root = tmp_path / "MOVi"
    r = np.random.RandomState(0)
    # flat frame layout: <root>/MOVi-E/<split>/<video>/{t:06d}.jpg (+ _mask)
    for split in ("train", "validation"):
        for vi in range(2):
            vdir = root / "MOVi-E" / split / str(vi)
            os.makedirs(vdir)
            for t in range(6):
                Image.fromarray(
                    (r.rand(64, 64, 3) * 255).astype(np.uint8)).save(
                        vdir / f"{t:06d}.jpg")
                Image.fromarray(
                    (r.randint(0, 5, (64, 64))).astype(np.uint8)).save(
                        vdir / f"{t:06d}_mask.png")

    p = BaseParams()
    p.dataset = "movi"
    p.movi_level = "e"
    p.data_root = str(root)
    p.resolution = (32, 32)
    p.n_sample_frames = 3
    p.frame_offset = 1
    p.video_len = 6
    p.load_mask = True
    train, val = build_movi_dataset(p)
    assert len(train) > 0 and len(val) > 0
    s = train[0]
    assert s["img"].shape == (3, 32, 32, 3)
    assert s["img"].dtype == np.float32
    assert -1.0 <= s["img"].min() and s["img"].max() <= 1.0
    assert "masks" not in s  # train split drops masks (build_movi_dataset)
    sv = val[0]
    assert sv["masks"].shape == (3, 32, 32)
    # mask ids suppressed to consecutive ints
    assert sv["masks"].max() < 5


def test_steve_movi_layout(tmp_path):
    """STEVE-MOVi on-disk layout: 08d-padded PNG frames + 10 per-object
    binary masks merged by argmax (reference steve_movi.py:57,69-87)."""
    from slotdiffusion_tpu.data.movi import build_movi_dataset
    from slotdiffusion_tpu.utils import BaseParams

    root = tmp_path / "MOVi"
    r = np.random.RandomState(0)
    for split in ("train", "test"):
        for vi in range(2):
            vdir = root / "MOVi-Solid" / split / str(vi)
            os.makedirs(vdir)
            for t in range(4):
                Image.fromarray(
                    (r.rand(32, 32, 3) * 255).astype(np.uint8)).save(
                        vdir / f"{t:08d}_image.png")
                for k in range(10):
                    m = np.zeros((32, 32), np.uint8)
                    if k < 3:  # 3 real objects, rest empty
                        m[k * 8:(k + 1) * 8, :] = 255
                    Image.fromarray(m).save(
                        vdir / f"{t:08d}_mask_{k:02d}.png")

    p = BaseParams()
    p.dataset = "steve_movi"
    p.movi_level = "Solid"
    p.data_root = str(root)
    p.resolution = (32, 32)
    p.n_sample_frames = 2
    p.frame_offset = 1
    p.video_len = 4
    p.load_mask = True
    train, val = build_movi_dataset(p)
    s = val[0]
    assert s["img"].shape == (2, 32, 32, 3)
    assert s["masks"].shape == (2, 32, 32)
    # 3 objects + background, ids suppressed to 0..3
    assert set(np.unique(s["masks"])) == {0, 1, 2, 3}


@pytest.mark.fast
def test_synthetic_coco_builder_and_collate():
    """synthetic_coco mirrors the COCODataset sample contract (coco.py):
    semantic `masks`, id-suppressed `inst_masks`, binary `overlap_masks`,
    variable-length `annos` padded with -1 rows by coco_collate_fn."""
    from slotdiffusion_tpu.data import build_dataset
    from slotdiffusion_tpu.utils import BaseParams

    params = BaseParams()
    params.dataset = "synthetic_coco"
    params.resolution = (32, 32)
    params.train_samples = 8
    params.val_samples = 4
    params.max_objects = 3

    train, val, collate = build_dataset(params)
    s = train[0]
    assert set(s) >= {"img", "masks", "inst_masks", "overlap_masks",
                      "annos"}
    assert s["masks"].shape == (32, 32) and s["masks"].max() <= 2
    # inst ids are suppressed to contiguous 0..K
    ids = np.unique(s["inst_masks"])
    assert np.array_equal(ids, np.arange(len(ids)))
    assert set(np.unique(s["overlap_masks"])) <= {0, 1}
    assert s["annos"].shape[1] == 5

    batch = collate([train[i] for i in range(4)])
    n_max = max(max(train[i]["annos"].shape[0] for i in range(4)), 1)
    assert batch["annos"].shape == (4, n_max, 5)
    assert batch["img"].shape == (4, 32, 32, 3)
    # val_only returns the bare val set
    val_set = build_dataset(params, val_only=True)
    assert len(val_set) == 4


@pytest.mark.fast
def test_synthetic_rollout_slots_labels_match_renderer(tmp_path):
    """Cross-file invariant (ADVICE r3): SyntheticRolloutSlotsDataset's
    VQA labels re-derive the renderer's object count from the same
    (seed, render_idx) RNG stream synthetic.py uses — verified against
    the ACTUAL rendered masks (mask.max() == n_objects since the last
    painted object always overwrites with id n_obj), for both split
    seeds; plus builder seed wiring, _meta validation, and the
    missing-split error."""
    from slotdiffusion_tpu.data import build_dataset
    from slotdiffusion_tpu.data.synthetic import SyntheticVideoDataset
    from slotdiffusion_tpu.utils import BaseParams
    from slotdiffusion_tpu.utils.misc import dump_obj

    max_objects = 4
    pkl = {
        "train": {str(i): np.zeros((6, 3, 8), np.float32)
                  for i in range(6)},
        "val": {str(i): np.zeros((6, 3, 8), np.float32)
                for i in range(4)},
        "test": {str(i): np.zeros((6, 3, 8), np.float32)
                 for i in range(4)},
        "_meta": dict(max_objects=max_objects, seed=0, params="x.py"),
    }
    path = str(tmp_path / "rollout.pkl")
    dump_obj(pkl, path)

    params = BaseParams()
    params.dataset = "synthetic_rollout_slots"
    params.rollout_root = path
    params.max_objects = max_objects

    train, val = build_dataset(params)
    assert (train.seed, val.seed) == (0, 1)  # render seeds train/val

    min_obj = (max_objects + 2) // 2
    for ds, seed, n in ((train, 0, 6), (val, 1, 4)):
        vid = SyntheticVideoDataset(
            resolution=(32, 32), num_samples=n, n_sample_frames=1,
            max_objects=max_objects, load_mask=True, seed=seed)
        for i in range(n):
            n_obj = int(vid[i]["masks"].max())
            s = ds[i]
            assert int(s["task_idx"]) == n_obj - 1, (seed, i)
            assert int(s["label"]) == int(n_obj >= min_obj), (seed, i)

    # val_only -> test split
    test_ds = build_dataset(params, val_only=True)
    assert len(test_ds) == 4

    # _meta mismatch fails loudly instead of corrupting labels
    params_bad = BaseParams()
    params_bad.dataset = "synthetic_rollout_slots"
    params_bad.rollout_root = path
    params_bad.max_objects = max_objects + 1
    with pytest.raises(ValueError, match="max_objects"):
        build_dataset(params_bad)

    # a pkl with no usable split raises a descriptive error
    dump_obj({"train": pkl["train"]}, str(tmp_path / "nosplit.pkl"))
    params.rollout_root = str(tmp_path / "nosplit.pkl")
    with pytest.raises(ValueError, match="neither"):
        build_dataset(params)


@pytest.mark.fast
def test_synthetic_video_slots_data_idx_is_render_idx(tmp_path):
    """SyntheticVideoSlotsDataset must emit data_idx == int(name) (the
    source render index): rollout pkls are keyed by data_idx, and the
    rollout-label RNG re-runs the renderer at that index — a positional
    data_idx silently misaligns labels once the slots pkl is subset."""
    from slotdiffusion_tpu.data.synthetic_slots import (
        SyntheticVideoSlotsDataset)

    # a filtered extraction: only odd render indices survive
    slots = {str(i): np.zeros((4, 3, 8), np.float32) for i in (1, 3, 7)}
    ds = SyntheticVideoSlotsDataset(slots, resolution=(32, 32), video_len=4)
    got = [int(ds[i]["data_idx"]) for i in range(len(ds))]
    assert got == [1, 3, 7]
