"""Extract per-video slots to a pkl for the vp_vqa pipeline.

Analog of reference video_based/extract_slots.py: run the video encoder over
every video of every split, save {split: {video_name: [T, N, C]}} pkl
(extract_slots.py:50-65). The reference parallelizes with DataParallel
(:104-112); here the jitted encode is already batched on-device.
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
    parser.add_argument("--save_path", required=True,
                        help="output .pkl path")
    parser.add_argument("--bs", type=int, default=4)
    parser.add_argument("--clip_len", type=int, default=-1,
                        help="static chunk length for long videos")
    parser.add_argument("--seq_len", type=int, default=-1,
                        help="override the dataset video length (datasets "
                             "without full-video mode, e.g. synthetic)")
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
    from slotdiffusion_tpu.methods.inference import chunked_video_apply
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import apply_overrides, dump_obj, load_params

    params = apply_overrides(load_params(args.params),
                         args.overrides)
    if args.seq_len > 0:
        params.n_sample_frames = args.seq_len
    model = build_model(params)
    variables = load_model_params(model, args.weight, params)
    clip_len = args.clip_len if args.clip_len > 0 else params.get(
        "clip_len", params.get("n_sample_frames", 6))

    @jax.jit
    def encode_chunk(img, prev_slots):
        return model.apply(variables, {"img": img}, prev_slots=prev_slots,
                           train=False, testing=True,
                           rngs={"diffusion": jax.random.PRNGKey(0)})

    def encode_video(img):
        """img: [B, T, H, W, 3] -> slots [B, T, N, C] via the shared
        static-chunk + slot-carry helper (methods/inference.py)."""
        out = chunked_video_apply(encode_chunk, img, clip_len,
                                  keys=("slots",))
        return out["slots"]

    all_slots = {}
    for split in ("train", "val", "test"):
        try:
            ds = build_dataset(params, val_only=(split == "test"))
            if isinstance(ds, tuple):
                ds = ds[0] if split == "train" else ds[1]
        except (FileNotFoundError, ValueError) as e:
            print(f"skip split {split}: {e}")
            continue
        if hasattr(ds, "load_video"):
            ds.load_video = True
        loader = DataLoader(ds, batch_size=args.bs, shuffle=False,
                            drop_last=False,
                            num_workers=params.get("num_workers", 4))
        split_slots = {}
        for i, batch in enumerate(loader):
            slots = encode_video(batch["img"])
            for b, data_idx in enumerate(np.asarray(batch["data_idx"])):
                name = os.path.basename(ds.files[int(data_idx)]) \
                    if hasattr(ds, "files") else str(int(data_idx))
                split_slots[name] = slots[b]
            if i % 10 == 0:
                print(f"[{split} {i}/{len(loader)}]")
        all_slots[split] = split_slots
        print(f"{split}: {len(split_slots)} videos")
    dump_obj(all_slots, args.save_path)
    print(f"saved slots to {args.save_path}")


if __name__ == "__main__":
    main()
