"""Roll out future slots on Physion with a trained SlotFormer.

Analog of reference vp_vqa/rollout_physion_slots.py: burn in the first 45
observed frames (1.5s at 30FPS, :18), autoregressively roll out the
remaining 105, and save {split: {video_name: [T, N, C]}} pkl for readout
training. For models trained with `frame_offset` k > 1 the reference
rolls out k strided sub-sequences and re-interleaves them into
consecutive frames (:41-56); that logic lives in
`slotdiffusion_tpu.methods.inference.interleaved_rollout`.
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
    parser.add_argument("--obs_frames", type=int, default=OBS_FRAMES,
                        help="burn-in frames (reference: 45 = 1.5s@30FPS;"
                             " override for synthetic-scale smoke drives)")
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
    import jax.numpy as jnp
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.methods.inference import interleaved_rollout
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import apply_overrides, dump_obj, load_params

    params = apply_overrides(load_params(args.params),
                         args.overrides)
    model = build_model(params)
    variables = load_model_params(model, args.weight, params)
    history_len = params.rollout_dict["history_len"]
    frame_offset = int(params.get("frame_offset", 1))

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def rollout_jit(past_slots, pred_len):
        return model.apply(
            variables, past_slots, pred_len,
            method=model.rollout)

    def rollout_fn(past, pred_len):
        return jax.device_get(rollout_jit(jnp.asarray(past), pred_len))

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
            full = interleaved_rollout(
                np.asarray(batch["slots"]), rollout_fn,
                args.obs_frames, history_len, frame_offset)
            for b, data_idx in enumerate(np.asarray(batch["data_idx"])):
                name = os.path.basename(ds.files[int(data_idx)]) \
                    if hasattr(ds, "files") else str(int(data_idx))
                split_out[name] = full[b]
            if i % 10 == 0:
                print(f"[{split} {i}/{len(loader)}]")
        all_out[split] = split_out
    # provenance metadata: the rollout-label RNG (synthetic_rollout_slots)
    # must re-run the renderer with the SAME max_objects/seed the source
    # videos used; builders.py validates this at load time so a chained
    # config mismatch fails loudly instead of corrupting supervision
    all_out["_meta"] = dict(
        max_objects=int(params.get("max_objects", -1)),
        seed=int(params.get("seed", 0)),
        params=os.path.basename(args.params),
    )
    dump_obj(all_out, args.save_path)
    print(f"saved rollout slots to {args.save_path}")


if __name__ == "__main__":
    main()
