"""Input-pipeline throughput benchmark at MOVi flagship scale.

Question (round-2 verdict): can the host loader feed the device train
step (42.9 steps/s on one v5e chip for the UNet denoise train step)?
This measures loader-only batches/s on bs32 x 3-frame x 128x128 clips
from a generated on-disk MOVi layout (JPEG frames + grayscale PNG
masks), with and without the native fastio decode path, plus the
prefetch_to_device overlap wrapper.

Usage: python scripts/bench_loader.py [--videos 24] [--bs 32]
       [--batches 20] [--workers 4] [--masks]

Record results in BASELINE.md. Note this image has ONE host CPU core;
production TPU hosts have tens — scale the measured rate by the worker
scaling shown when interpreting.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def generate_layout(root, videos, frames, res):
    import numpy as np
    from PIL import Image

    r = np.random.RandomState(0)
    for split, n in (("train", videos), ("validation", 1)):
        for vi in range(n):
            vdir = os.path.join(root, "MOVi-E", split, str(vi))
            os.makedirs(vdir, exist_ok=True)
            for t in range(frames):
                img = (r.rand(res, res, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(vdir, f"{t:06d}.jpg"), quality=90)
                Image.fromarray(r.randint(0, 11, (res, res)).astype(
                    np.uint8)).save(os.path.join(vdir, f"{t:06d}_mask.png"))


def bench(root, args, fastio):
    import numpy as np

    os.environ.pop("SLOTDIFFUSION_NO_FASTIO", None)
    if not fastio:
        os.environ["SLOTDIFFUSION_NO_FASTIO"] = "1"
    # fresh import state for the fastio toggle
    for m in list(sys.modules):
        if "slotdiffusion_tpu" in m:
            del sys.modules[m]
    from slotdiffusion_tpu.data import DataLoader
    from slotdiffusion_tpu.data.movi import build_movi_dataset
    from slotdiffusion_tpu.utils import BaseParams

    p = BaseParams()
    p.dataset = "movi"
    p.movi_level = "e"
    p.data_root = root
    p.resolution = (128, 128)
    p.n_sample_frames = 3
    p.frame_offset = 1
    p.video_len = args.frames
    p.load_mask = args.masks
    train, _ = build_movi_dataset(p)
    if args.masks:
        train.load_mask = True

    loader = DataLoader(train, batch_size=args.bs, shuffle=True,
                        drop_last=True, num_workers=args.workers,
                        worker_mode=args.worker_mode)
    best = 0.0
    for rep in range(2):  # rep 0 doubles as page-cache warmup
        it = iter(loader)
        next(it)
        n = 0
        t0 = time.time()
        for batch in it:
            n += 1
            if n >= args.batches:
                break
        best = max(best, n / (time.time() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--worker_mode", default="thread",
                    choices=("thread", "process"),
                    help="threaded workers vs spawn worker processes")
    ap.add_argument("--masks", action="store_true",
                    help="also decode segmentation masks (eval pipeline)")
    ap.add_argument("--root", default="",
                    help="reuse an existing generated layout")
    args = ap.parse_args()

    root = args.root or os.path.join(tempfile.gettempdir(),
                                     "bench_movi_layout")
    marker = os.path.join(root, ".done")
    if not os.path.isfile(marker):
        print(f"generating MOVi layout under {root} ...")
        generate_layout(root, args.videos, args.frames, 128)
        open(marker, "w").close()

    for fastio in (True, False):
        sps = bench(root, args, fastio)
        label = "fastio" if fastio else "PIL   "
        print(f"{label} loader: {sps:6.2f} batches/s "
              f"(bs{args.bs} x {3} x 128^2"
              f"{' +masks' if args.masks else ''}, "
              f"{args.workers} workers) = {sps * args.bs * 3:6.0f} "
              f"frames/s")


if __name__ == "__main__":
    main()
