"""Physion VQA accuracy evaluation.

Analog of reference vp_vqa/test_physion_vqa.py: for each readout checkpoint,
sweep sigmoid thresholds {0.4, 0.45, ..., 0.65} over the test set, report
the best overall accuracy and the per-task breakdown (:53-127).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

THRESHOLDS = [0.4, 0.45, 0.5, 0.55, 0.6, 0.65]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True,
                        help="ckpt dir or glob of ckpt dirs")
    parser.add_argument("--bs", type=int, default=32)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (tiny models need no TPU;\n                        also a fallback when the device tunnel is wedged)")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="override any params attribute post-load")
    args = parser.parse_args()

    import jax

    if args.cpu:
        # the axon sitecustomize sets jax_platforms via jax.config at
        # startup, which beats the env var
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import apply_overrides, load_params

    params = apply_overrides(load_params(args.params),
                         args.overrides)
    params.subset = "test"
    ds = build_dataset(params, val_only=True)
    loader = DataLoader(ds, batch_size=args.bs, shuffle=False,
                        drop_last=False,
                        num_workers=params.get("num_workers", 4))
    model = build_model(params)

    ckpts = sorted(glob.glob(args.weight)) or [args.weight]
    best = (-1.0, None, None)
    for ckpt in ckpts:
        variables = load_model_params(model, ckpt, params)

        @jax.jit
        def forward(batch):
            return model.apply(variables, batch, train=False)

        probs, labels, tasks = [], [], []
        for batch in loader:
            out = jax.device_get(forward({"slots": batch["slots"]}))
            probs.append(1.0 / (1.0 + np.exp(-np.asarray(out["logits"]))))
            labels.append(np.asarray(batch["label"]))
            tasks.append(np.asarray(batch["task_idx"]))
        probs = np.concatenate(probs)
        labels = np.concatenate(labels)
        tasks = np.concatenate(tasks)

        for th in THRESHOLDS:
            acc = float(((probs > th) == (labels > 0.5)).mean())
            if acc > best[0]:
                best = (acc, ckpt, th)
        print(f"{ckpt}: best-so-far acc={best[0]:.4f} @th={best[2]}")

    acc, ckpt, th = best
    print(f"BEST acc={acc:.4f} ckpt={ckpt} threshold={th}")
    # per-task breakdown at the best setting
    variables = load_model_params(model, ckpt, params)

    @jax.jit
    def forward(batch):
        return model.apply(variables, batch, train=False)

    probs, labels, tasks = [], [], []
    for batch in loader:
        out = jax.device_get(forward({"slots": batch["slots"]}))
        probs.append(1.0 / (1.0 + np.exp(-np.asarray(out["logits"]))))
        labels.append(np.asarray(batch["label"]))
        tasks.append(np.asarray(batch["task_idx"]))
    probs, labels, tasks = map(np.concatenate, (probs, labels, tasks))
    all_tasks = getattr(ds, "all_tasks", sorted(set(tasks.tolist())))
    for ti, tname in enumerate(all_tasks):
        sel = tasks == ti
        if sel.any():
            acc_t = float(((probs[sel] > th) == (labels[sel] > 0.5)).mean())
            print(f"  {tname}: acc={acc_t:.4f} (n={int(sel.sum())})")


if __name__ == "__main__":
    main()
