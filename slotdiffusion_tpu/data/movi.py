"""MOVi-[A-E] video datasets (+ the STEVE-MOVi Solid/Tex variants).

Rebuild of video_based/datasets/movi.py and steve_movi.py: frame-folder
videos (`{data_root}/MOVi-{L}/{split}/{video}/{frame:06d}.jpg` with
grayscale `{frame:06d}_mask.png`), per-split clip indexing (train: every
valid start idx; val: strided non-overlapping; test: one clip per video,
movi.py:147-180), mask id suppression, full-video `get_video` API, cached
split file lists, corrupted-frame retry via SampleError.

The STEVE-MOVi variants (steve_movi.py:14-132) use a different on-disk
layout (`{frame:08d}_image.png` + 10 per-object binary masks
`{frame:08d}_mask_{k:02d}.png` merged by argmax) and only train/test
splits; the class below handles both through `layout`.
"""

import os.path as osp

import numpy as np
from PIL import Image, ImageFile

from ..utils.misc import dump_obj, glob_all, load_obj, mkdir_or_exist
from .loader import Dataset, SampleError
from .transforms import BaseTransforms, suppress_mask_idx

ImageFile.LOAD_TRUNCATED_IMAGES = True

def _cache_dir():
    import os
    return os.environ.get("SLOTDIFFUSION_CACHE",
                          osp.expanduser("~/.cache/slotdiffusion_tpu"))


class MOViDataset(Dataset):
    """MOVi video clips. Sample: {'img': [T, H, W, 3] in [-1,1],
    'masks': [T, H, W] int32 (optional), 'data_idx'}."""

    def __init__(self, level, data_root, resolution, split="train",
                 n_sample_frames=6, frame_offset=1, video_len=24,
                 load_mask=False, layout="movi"):
        # MOVi levels are single letters (D/E); STEVE-MOVi uses Solid/Tex
        level = level.upper() if layout == "movi" else level.capitalize()
        if split == "val":
            split = "validation"
        if layout == "steve_movi" and split == "validation":
            split = "test"  # STEVE-MOVi has no val split (steve_movi.py:30)
        assert split in ("train", "validation", "test")
        self.level = level
        self.split = split
        self.layout = layout
        self.data_root = osp.join(data_root, f"MOVi-{level}", split)
        self.transforms = BaseTransforms(resolution)
        self.n_sample_frames = n_sample_frames
        self.frame_offset = frame_offset or 1
        self.video_len = video_len
        self.load_mask = load_mask
        self.load_video = False  # full-video mode for test_seg etc.
        self.valid_idx = self._index_clips()

    # ------------------------------------------------------------------

    # STEVE-MOVi (Solid/Tex) ships 08d-padded PNG frames and NUM_MASKS
    # per-object binary masks per frame (reference steve_movi.py:57,71-87)
    NUM_STEVE_MASKS = 10

    def _frame_path(self, folder, i):
        if self.layout == "movi":
            return osp.join(folder, f"{i:06d}.jpg")
        return osp.join(folder, f"{i:08d}_image.png")

    def _mask_path(self, folder, i):
        if self.layout == "movi":
            return osp.join(folder, f"{i:06d}_mask.png")
        return osp.join(folder, f"{i:08d}_mask.png")

    def _read_mask(self, folder, i):
        """One frame's integer mask. MOVi: grayscale id png. STEVE-MOVi:
        merge the per-object binary masks by argmax with an all-ones
        background inserted at id 0 (steve_movi.py:69-87)."""
        if self.layout == "movi":
            m = np.asarray(Image.open(self._mask_path(folder, i)))
            if m.ndim == 3:  # RGB-coded ids -> flatten to ints
                H, W = m.shape[:2]
                flat = (m[..., 0].astype(np.int64) * 256 +
                        m[..., 1]) * 256 + m[..., 2]
                _, inv = np.unique(flat, return_inverse=True)
                m = inv.reshape(H, W).astype(np.int32)
            return m
        prefix = self._mask_path(folder, i)[:-4]  # strip .png
        objs = []
        for k in range(self.NUM_STEVE_MASKS):
            m = Image.open(f"{prefix}_{k:02d}.png").convert("L")
            objs.append(np.asarray(m))
        objs.insert(0, np.ones_like(objs[0]))
        return np.stack(objs, axis=0).argmax(0).astype(np.int32)

    def _index_clips(self):
        # cache key includes the data_root hash — the same level/split under
        # a different root (tests, relocated datasets) must not collide
        import hashlib
        root_tag = hashlib.md5(
            osp.abspath(self.data_root).encode()).hexdigest()[:8]
        cache = osp.join(_cache_dir(), "splits", "MOVi",
                         f"{self.level}-{self.layout}-{root_tag}",
                         f"{self.split}.json")
        if osp.isfile(cache):
            self.files = load_obj(cache)
        else:
            self.files = glob_all(osp.join(self.data_root, "*"),
                                  only_dir=True)
            if not self.files:
                raise FileNotFoundError(
                    f"no MOVi videos under {self.data_root}")
            mkdir_or_exist(osp.dirname(cache))
            dump_obj(self.files, cache)
        self.num_videos = len(self.files)
        valid = []
        span = (self.n_sample_frames - 1) * self.frame_offset
        if self.split == "train":
            for folder in self.files:
                valid += [(folder, s)
                          for s in range(self.video_len - span)]
        elif self.split == "test":
            valid = [(folder, 0) for folder in self.files]
        else:  # validation: strided non-overlapping clips
            size = self.n_sample_frames * self.frame_offset
            for folder in self.files:
                starts = []
                for idx in range(0, self.video_len - size + 1, size):
                    starts += [idx + i for i in range(self.frame_offset)]
                valid += [(folder, s) for s in starts]
        return valid

    # ------------------------------------------------------------------

    def _read_clip(self, folder, start, num):
        frames, masks = [], []
        for n in range(num):
            i = start + n * self.frame_offset
            try:
                frames.append(
                    self.transforms.load_image(self._frame_path(folder, i)))
            except (FileNotFoundError, OSError) as e:
                raise SampleError(str(e))
            if self.load_mask:
                try:
                    m = None
                    if self.layout == "movi":
                        # fused native PNG decode + nearest resize; None
                        # for RGB-coded/palette masks (PIL path below)
                        m = self.transforms.load_mask(
                            self._mask_path(folder, i))
                    if m is None:
                        m = self.transforms.process_mask(
                            self._read_mask(folder, i))
                except (FileNotFoundError, OSError) as e:
                    raise SampleError(str(e))
                masks.append(m)
        img = np.stack(frames).astype(np.float32)
        if self.load_mask:
            mask = suppress_mask_idx(np.stack(masks))
            return img, mask
        return img, None

    def get_video(self, video_idx):
        num = self.video_len // self.frame_offset
        img, mask = self._read_clip(self.files[video_idx], 0, num)
        out = {"video": img, "img": img, "data_idx": np.int32(video_idx)}
        if mask is not None:
            out["masks"] = mask
        return out

    def __len__(self):
        if self.load_video:
            return len(self.files)
        return len(self.valid_idx)

    def __getitem__(self, idx):
        if self.load_video:
            return self.get_video(idx)
        folder, start = self.valid_idx[idx]
        img, mask = self._read_clip(folder, start, self.n_sample_frames)
        out = {"data_idx": np.int32(idx), "img": img}
        if mask is not None:
            out["masks"] = mask
        return out


def build_movi_dataset(params, val_only=False):
    layout = "steve_movi" if params.dataset == "steve_movi" else "movi"
    kw = dict(
        level=params.movi_level,
        data_root=params.data_root,
        resolution=params.resolution,
        n_sample_frames=params.n_sample_frames,
        frame_offset=params.get("frame_offset", 1),
        video_len=params.get("video_len", 24),
        load_mask=params.load_mask,
        layout=layout,
    )
    if val_only:
        return MOViDataset(split="test", **kw)
    val = MOViDataset(split="validation", **kw)
    kw["load_mask"] = False  # masks not needed for training (movi.py:203)
    train = MOViDataset(split="train", **kw)
    return train, val
