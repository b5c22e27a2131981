"""Host-side utility helpers.

TPU-native replacements for the `nerv.utils` surface the reference relies on
(reference usage: video_based/datasets/movi.py:10, test_recon.py:13):
`load_obj/dump_obj` (pkl/json IO), `glob_all`, `save_video`, `AverageMeter`,
`mkdir_or_exist`, `read_all_lines`, `VideoReader`.
"""

import glob
import json
import os
import pickle

import numpy as np


class AverageMeter:
    """Tracks a running average of a scalar metric.

    NaN values are skipped, matching the reference's use of np.nanmean in
    metric aggregation (img_based/models/eval_utils.py:328).
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        val = float(val)
        if np.isnan(val):
            return
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count > 0 else 0.0


def mkdir_or_exist(path):
    os.makedirs(path, exist_ok=True)
    return path


def load_obj(path):
    """Load a pickle (.pkl) or json (.json) file."""
    if path.endswith(".json"):
        with open(path, "r") as f:
            return json.load(f)
    with open(path, "rb") as f:
        return pickle.load(f)


def dump_obj(obj, path):
    """Dump to pickle (.pkl) or json (.json) depending on extension."""
    mkdir_or_exist(os.path.dirname(os.path.abspath(path)))
    if path.endswith(".json"):
        with open(path, "w") as f:
            json.dump(obj, f)
        return
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def glob_all(pattern, only_dir=False):
    """Sorted glob; optionally restrict to directories."""
    files = sorted(glob.glob(pattern))
    if only_dir:
        files = [f for f in files if os.path.isdir(f)]
    return files


def read_all_lines(path):
    with open(path, "r") as f:
        return [line.rstrip("\n") for line in f.readlines()]


def to_rgb_from_tensor(x):
    """Undo the [-1, 1] normalization back to [0, 1].

    Matches reference video_based/models/utils.py:47-49.
    """
    return np.clip(np.asarray(x) * 0.5 + 0.5, 0.0, 1.0)


def save_video(frames, path, fps=8):
    """Save a [T, H, W, 3] uint8 or float [0,1] array as an mp4/gif.

    Replacement for `nerv.utils.save_video` (reference: test_recon.py:130).
    Environments without an ffmpeg/pyav imageio backend fall back to GIF
    (always writable via the bundled Pillow backend); the actual path
    written is returned.
    """
    import imageio

    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0.0, 1.0) * 255.0).astype(np.uint8)
    mkdir_or_exist(os.path.dirname(os.path.abspath(path)))
    try:
        imageio.mimsave(path, list(frames), fps=fps)
        return path
    except (ValueError, ImportError):
        if path.lower().endswith(".gif"):
            raise
        gif_path = os.path.splitext(path)[0] + ".gif"
        # imageio.v3 pins duration to milliseconds; the legacy v2 Pillow
        # plugin reads it as seconds, which would make 125s-per-frame GIFs
        import imageio.v3 as iio
        iio.imwrite(gif_path, frames, extension=".gif",
                    duration=1000.0 / max(fps, 1), loop=0)
        return gif_path


class VideoReader:
    """cv2-backed video file reader.

    `nerv.utils.VideoReader` analog covering the surface the reference
    uses (scripts/data_utils/physion_video2frames.py:26-30): open an mp4,
    dump its frames to a jpg folder with optional resize and frame cap.
    cv2 is imported lazily so the rest of the package works without it.
    """

    def __init__(self, path):
        import cv2

        if not os.path.isfile(path):
            raise FileNotFoundError(path)
        self._cv2 = cv2
        self.path = path
        self.cap = cv2.VideoCapture(path)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 0.0
        self.num_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    def __len__(self):
        return self.num_frames

    def _iter_frames(self, target_shape=None, max_num=-1, rgb=True):
        cv2 = self._cv2
        t = 0
        while max_num < 0 or t < max_num:
            ok, frame = self.cap.read()
            if not ok:
                break
            if target_shape is not None:
                # target_shape is (W, H) like nerv/cv2.resize
                frame = cv2.resize(frame, tuple(target_shape),
                                   interpolation=cv2.INTER_AREA)
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if rgb else frame
            t += 1

    def read_video(self, target_shape=None, max_num=-1):
        """Decode the whole video -> [T, H, W, 3] uint8 RGB array."""
        frames = list(self._iter_frames(target_shape, max_num))
        self.release()
        return np.stack(frames) if frames else np.zeros((0, 0, 0, 3),
                                                        np.uint8)

    def cvt2frames(self, frame_dir, target_shape=None, max_num=-1,
                   filename_tmpl="{:06d}.jpg", quality=95):
        """Dump frames to `frame_dir` as jpgs (the Physion layout the
        datasets consume: 000000.jpg, 000001.jpg, ...)."""
        cv2 = self._cv2
        mkdir_or_exist(frame_dir)
        n = 0
        for frame in self._iter_frames(target_shape, max_num, rgb=False):
            cv2.imwrite(os.path.join(frame_dir, filename_tmpl.format(n)),
                        frame, [cv2.IMWRITE_JPEG_QUALITY, quality])
            n += 1
        self.release()
        return n

    def release(self):
        if self.cap is not None:
            self.cap.release()
            self.cap = None


def save_image(img, path):
    """Save a [H, W, 3] uint8 or float [0,1] array as an image file."""
    import imageio

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    mkdir_or_exist(os.path.dirname(os.path.abspath(path)))
    imageio.imwrite(path, img)
