"""Segmentation evaluation harness.

Analog of reference video_based/test_seg.py / img_based/test_seg.py: run the
model on the val/test set, argmax predicted slot masks, compute
FG-ARI/mIoU/mBO (video: T folded into space for temporal consistency,
test_seg.py:25-41; images: optional overlap-mask handling for COCO).

Like the reference (test_seg.py:79,103-113), `--seq_len` takes a list of
clip lengths to sweep; -1 means the entire video. Full videos longer than
the training clip go through `chunked_video_apply` — fixed-length jitted
chunks with slot carry-over — instead of one giant (or dynamically shaped)
compile.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

VIDEO_MODELS = ("SAVi", "SAViDiffusion", "STEVE")


def evaluate(params, args, model, variables, seq_len, clip_len):
    """`clip_len` is the TRAINING clip length captured once in main() —
    params.n_sample_frames is overridden per sweep value below, so reading
    it here would make later iterations (e.g. `--seq_len 6 -1`) chunk at
    the previous sweep value instead of the training length."""
    import jax
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.methods.build import seg_metrics_fn
    from slotdiffusion_tpu.methods.inference import chunked_video_apply
    from slotdiffusion_tpu.utils import AverageMeter

    full_video = seq_len <= 0
    params.n_sample_frames = clip_len if full_video else seq_len

    params.load_mask = True
    val_set = build_dataset(params, val_only=(args.split == "test"))
    collate_fn = None
    if isinstance(val_set, tuple):
        if len(val_set) == 3:
            collate_fn = val_set[2]
        val_set = val_set[1]
    if params.dataset in ("coco", "synthetic_coco") and collate_fn is None:
        # val_only returns the bare dataset; COCO's variable-length annos
        # need the -1-padding collater either way (coco_transforms.py:180)
        from slotdiffusion_tpu.data.coco import coco_collate_fn
        collate_fn = coco_collate_fn
    if full_video and hasattr(val_set, "load_video"):
        val_set.load_video = True

    bs = args.bs if args.bs > 0 else params.val_batch_size
    loader = DataLoader(val_set, batch_size=bs, shuffle=False,
                        drop_last=False, collate_fn=collate_fn,
                        num_workers=params.get("num_workers", 4))

    @jax.jit
    def forward(batch):
        return model.apply(
            variables, batch, train=False,
            rngs={"diffusion": jax.random.PRNGKey(0)})

    @jax.jit
    def forward_chunk(img, prev_slots):
        return model.apply(
            variables, {"img": img}, prev_slots=prev_slots, train=False,
            rngs={"diffusion": jax.random.PRNGKey(0)})

    is_video = params.model in VIDEO_MODELS

    meters = {}
    for i, np_batch in enumerate(loader):
        img = np_batch["img"]
        if is_video and img.shape[1] > clip_len:
            out = chunked_video_apply(
                forward_chunk, img, clip_len, keys=("slots", "masks"))
        else:
            out = jax.device_get(forward({"img": img}))
        metrics = seg_metrics_fn(np_batch, out)
        n = img.shape[0]
        for k, v in metrics.items():
            meters.setdefault(k, AverageMeter()).update(v, n)
        if i % 10 == 0:
            print(f"[{i}/{len(loader)}] " + " ".join(
                f"{k}={m.avg:.4f}" for k, m in meters.items()))
    # reference report format: config name + clip length, % metrics
    label = "full" if full_video else str(seq_len)
    print(f"{os.path.basename(args.params)}, L={label}")
    for k, m in meters.items():
        print(f"{k}: {m.avg * 100.:.2f}")
    print("FINAL " + " ".join(f"{k}={m.avg:.4f}"
                              for k, m in meters.items()))
    return {k: m.avg for k, m in meters.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--bs", type=int, default=-1)
    parser.add_argument("--split", default="test", choices=["val", "test"])
    parser.add_argument("--seq_len", nargs="+", type=int, default=[-1],
                        help="clip lengths to sweep; -1 = full video "
                             "(reference test_seg.py:79,103-113)")
    args = parser.parse_args()

    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import load_params

    params = load_params(args.params)
    model = build_model(params)
    variables = load_model_params(model, args.weight, params)

    # capture the training clip length before any sweep override mutates it
    clip_len = params.get("n_sample_frames", 1)
    for seq_len in args.seq_len:
        evaluate(params, args, model, variables, seq_len, clip_len)


if __name__ == "__main__":
    main()
