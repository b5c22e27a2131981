"""Roll out future slots on Physion with a trained SlotFormer.

Analog of reference vp_vqa/rollout_physion_slots.py: burn in the first 45
observed frames, autoregressively roll out the remaining 105, interleaving
rollouts started at each frame offset (:18, :39-63), and save
{split: {video_name: [T, N, C]}} pkl for readout training.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

OBS_FRAMES = 45  # reference rollout_physion_slots.py:18


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--bs", type=int, default=16)
    args = parser.parse_args()

    import jax
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import dump_obj, load_params

    params = load_params(args.params)
    model = build_model(params)
    variables = load_model_params(model, args.weight, params)
    history_len = params.rollout_dict["history_len"]
    video_len = params.get("video_len", 150)
    pred_len = video_len - OBS_FRAMES

    @jax.jit
    def rollout_fn(past_slots):
        return model.apply(
            variables, past_slots, pred_len,
            method=model.rollout)

    all_out = {}
    for split in ("train", "val", "test"):
        try:
            ds = build_dataset(params, val_only=(split == "test"))
            if isinstance(ds, tuple):
                ds = ds[0] if split == "train" else ds[1]
        except (FileNotFoundError, ValueError, KeyError) as e:
            print(f"skip split {split}: {e}")
            continue
        loader = DataLoader(ds, batch_size=args.bs, shuffle=False,
                            drop_last=False,
                            num_workers=params.get("num_workers", 4))
        split_out = {}
        for i, batch in enumerate(loader):
            slots = np.asarray(batch["slots"])  # [B, T, N, C]
            obs = slots[:, :OBS_FRAMES]
            pred = np.asarray(jax.device_get(rollout_fn(
                obs[:, -history_len:])))  # [B, pred_len, N, C]
            full = np.concatenate([obs, pred], axis=1)
            for b, data_idx in enumerate(np.asarray(batch["data_idx"])):
                name = os.path.basename(ds.files[int(data_idx)]) \
                    if hasattr(ds, "files") else str(int(data_idx))
                split_out[name] = full[b]
            if i % 10 == 0:
                print(f"[{split} {i}/{len(loader)}]")
        all_out[split] = split_out
    dump_obj(all_out, args.save_path)
    print(f"saved rollout slots to {args.save_path}")


if __name__ == "__main__":
    main()
