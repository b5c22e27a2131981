"""Segmentation evaluation harness.

Analog of reference video_based/test_seg.py / img_based/test_seg.py: run the
model on the val/test set, argmax predicted slot masks, compute
FG-ARI/mIoU/mBO (video: T folded into space for temporal consistency,
test_seg.py:103-113; images: optional overlap-mask handling for COCO).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--bs", type=int, default=-1)
    parser.add_argument("--split", default="test", choices=["val", "test"])
    args = parser.parse_args()

    import jax
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.methods.build import seg_metrics_fn
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import AverageMeter, load_params

    params = load_params(args.params)
    params.load_mask = True
    # evaluate on full videos where the dataset supports it
    val_set = build_dataset(params, val_only=(args.split == "test"))
    if isinstance(val_set, tuple):
        val_set = val_set[1]
    if hasattr(val_set, "load_video"):
        val_set.load_video = True

    bs = args.bs if args.bs > 0 else params.val_batch_size
    loader = DataLoader(val_set, batch_size=bs, shuffle=False,
                        drop_last=False,
                        num_workers=params.get("num_workers", 4))

    model = build_model(params)
    variables = load_model_params(model, args.weight, params)

    @jax.jit
    def forward(batch):
        return model.apply(
            variables, batch, train=False,
            rngs={"diffusion": jax.random.PRNGKey(0)})

    meters = {}
    for i, np_batch in enumerate(loader):
        batch = {"img": np_batch["img"]}
        out = jax.device_get(forward(batch))
        metrics = seg_metrics_fn(np_batch, out)
        n = np_batch["img"].shape[0]
        for k, v in metrics.items():
            meters.setdefault(k, AverageMeter()).update(v, n)
        if i % 10 == 0:
            print(f"[{i}/{len(loader)}] " + " ".join(
                f"{k}={m.avg:.4f}" for k, m in meters.items()))
    print("FINAL " + " ".join(f"{k}={m.avg:.4f}"
                              for k, m in meters.items()))


if __name__ == "__main__":
    main()
