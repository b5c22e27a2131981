"""Generate an on-disk MOVi-layout dataset tree from the synthetic renderer.

Writes the exact frame-folder layout the reference's MOVi datasets read
(video_based/datasets/movi.py:62-106): ``{root}/MOVi-{L}/{split}/{vid}/
{t:06d}.jpg`` plus grayscale ``{t:06d}_mask.png`` id masks — but with the
repo's procedurally generated drifting-shape scenes
(data/synthetic.py:SyntheticVideoDataset) as content, so a file-backed
`Trainer.fit` run exercises the full JPEG/PNG decode + split-cache +
retry + prefetch pipeline on the same visual distribution as the
in-memory soaks (curves directly comparable).

Usage:
    python scripts/gen_movi_tree.py --root /tmp/movi_tree \
        --videos 512 --val_videos 32 --frames 6 --res 64
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from slotdiffusion_tpu.data.synthetic import SyntheticVideoDataset  # noqa: E402


def write_split(root, level, split, n_videos, frames, res, seed,
                jpeg_quality=95):
    ds = SyntheticVideoDataset(resolution=(res, res), num_samples=n_videos,
                               n_sample_frames=frames, load_mask=True,
                               seed=seed)
    for vi in range(n_videos):
        sample = ds[vi]
        imgs = ((sample["img"] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        masks = sample["masks"].astype(np.uint8)
        vdir = os.path.join(root, f"MOVi-{level}", split, f"{vi:05d}")
        os.makedirs(vdir, exist_ok=True)
        for t in range(frames):
            Image.fromarray(imgs[t]).save(
                os.path.join(vdir, f"{t:06d}.jpg"), quality=jpeg_quality)
            Image.fromarray(masks[t]).save(
                os.path.join(vdir, f"{t:06d}_mask.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--level", default="E")
    ap.add_argument("--videos", type=int, default=512)
    ap.add_argument("--val_videos", type=int, default=32)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args()

    write_split(args.root, args.level, "train", args.videos, args.frames,
                args.res, args.seed, args.quality)
    # val seed offset matches SyntheticVideoDataset val convention (builders)
    write_split(args.root, args.level, "validation", args.val_videos,
                args.frames, args.res, args.seed + 1, args.quality)
    # test split: reuse validation content for tooling that needs it
    print(f"wrote {args.videos}+{args.val_videos} videos x {args.frames} "
          f"frames at {args.res}x{args.res} under {args.root}")


if __name__ == "__main__":
    main()
