"""Extract Physion mp4s to jpg frame folders.

Analog of the reference's scripts/data_utils/physion_video2frames.py
(:6-55): every `<scenario>/*.mp4` under --data_root becomes a sibling
folder of jpg frames, processed by a thread pool (cv2 releases the GIL
during decode). The reference resizes to 128x128 and caps at 200 frames
(physion_video2frames.py:7-8); both are flags here with the same defaults.
"""

import argparse
import glob
import os.path as osp
from concurrent.futures import ThreadPoolExecutor

from slotdiffusion_tpu.utils.misc import VideoReader


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True,
                        help="dir containing <scenario>/*.mp4")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--resize", type=int, nargs=2, default=(128, 128),
                        metavar=("W", "H"),
                        help="target frame size; pass -1 -1 to keep native")
    parser.add_argument("--max_frames", type=int, default=200)
    args = parser.parse_args()
    shape = None if args.resize[0] < 0 else tuple(args.resize)

    def video2frames(video_path):
        out_dir = video_path[:-4]  # strip .mp4
        if osp.isdir(out_dir):  # already extracted (reference :28-29)
            return video_path, -1
        n = VideoReader(video_path).cvt2frames(
            out_dir, target_shape=shape, max_num=args.max_frames)
        return video_path, n

    videos = sorted(glob.glob(
        osp.join(args.data_root, "**", "*.mp4"), recursive=True))
    print(f"{len(videos)} videos")
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for i, (path, t) in enumerate(pool.map(video2frames, videos)):
            if i % 20 == 0:
                msg = "skipped (exists)" if t < 0 else f"{t} frames"
                print(f"[{i}/{len(videos)}] {osp.basename(path)}: {msg}")


if __name__ == "__main__":
    main()
