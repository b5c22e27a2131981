"""Download MOVi-D/E from the public Kubric bucket and dump frames/masks.

Analog of the reference's scripts/data_utils/download_movi.py: reads
`gs://kubric-public/tfds` via tensorflow_datasets and writes the
frame-folder layout the MOVi dataset class expects:

    <out>/MOVi-{LEVEL}/{split}/{video_idx}/
        {t:06d}.jpg
        {t:06d}_mask.png   (grayscale instance ids)

Requires `tensorflow_datasets` (not bundled here; run wherever TFDS and
GCS access are available — the training environment only needs the dumped
frames).
"""

import argparse
import os
import os.path as osp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--level", default="e", choices=["d", "e"])
    parser.add_argument("--out", default="./data/MOVi")
    parser.add_argument("--splits", nargs="+",
                        default=["train", "validation"])
    parser.add_argument("--res", type=int, default=128)
    args = parser.parse_args()

    try:
        import tensorflow_datasets as tfds
    except ImportError as e:
        raise SystemExit(
            "tensorflow_datasets is required to download MOVi; run this "
            f"script in an environment that has it ({e})")
    import numpy as np
    from PIL import Image

    ds_name = f"movi_{args.level}/{args.res}x{args.res}:1.0.0"
    for split in args.splits:
        ds = tfds.load(ds_name, data_dir="gs://kubric-public/tfds",
                       split=split)
        for vi, sample in enumerate(tfds.as_numpy(ds)):
            vdir = osp.join(args.out, f"MOVi-{args.level.upper()}", split,
                            str(vi))
            os.makedirs(vdir, exist_ok=True)
            video = sample["video"]  # [T, H, W, 3] uint8
            segs = sample["segmentations"][..., 0]  # [T, H, W] uint8
            for t in range(video.shape[0]):
                Image.fromarray(video[t]).save(
                    osp.join(vdir, f"{t:06d}.jpg"), quality=95)
                Image.fromarray(segs[t].astype(np.uint8)).save(
                    osp.join(vdir, f"{t:06d}_mask.png"))
            if vi % 50 == 0:
                print(f"[{split}] {vi} videos done")


if __name__ == "__main__":
    main()
