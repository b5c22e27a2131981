"""Extract Physion mp4s to jpg frame folders.

Analog of the reference's scripts/data_utils/physion_video2frames.py
(:6-55): every `<scenario>/*.mp4` under --data_root becomes a sibling
folder of jpg frames, processed by a thread pool (cv2 releases the GIL
during decode).
"""

import argparse
import glob
import os
import os.path as osp
from concurrent.futures import ThreadPoolExecutor


def video2frames(video_path):
    import cv2

    out_dir = video_path[:-4]  # strip .mp4
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    t = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(osp.join(out_dir, f"{t:06d}.jpg"), frame,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        t += 1
    cap.release()
    return video_path, t


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True,
                        help="dir containing <scenario>/*.mp4")
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()

    videos = sorted(glob.glob(
        osp.join(args.data_root, "**", "*.mp4"), recursive=True))
    print(f"{len(videos)} videos")
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for i, (path, t) in enumerate(pool.map(video2frames, videos)):
            if i % 20 == 0:
                print(f"[{i}/{len(videos)}] {osp.basename(path)}: {t} frames")


if __name__ == "__main__":
    main()
