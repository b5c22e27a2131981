"""Video prediction metrics on SlotFormer rollouts.

Analog of reference vp_vqa/test_vp.py: burn in observed slots, roll out,
decode frames with the frozen LDM (DPM-Solver), and compute
MSE/PSNR/SSIM(+LPIPS) against GT future frames (:24-82).
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
    parser.add_argument("--bs", type=int, default=4)
    parser.add_argument("--max_batches", type=int, default=-1)
    args = parser.parse_args()

    import jax
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.ops import metrics as M
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import AverageMeter, load_params

    params = load_params(args.params)
    params.load_img = True
    ds = build_dataset(params, val_only=True)
    loader = DataLoader(ds, batch_size=args.bs, shuffle=False,
                        drop_last=False,
                        num_workers=params.get("num_workers", 4))
    model = build_model(params)
    variables = load_model_params(model, args.weight, params)
    history_len = params.rollout_dict["history_len"]
    rollout_len = params.loss_dict["rollout_len"]

    @jax.jit
    def rollout_decode(past_slots, rng):
        out = model.apply(
            variables, past_slots, rollout_len, True, False, rng,
            rngs={"diffusion": rng}, method=model.rollout)
        return out["recon_combined"]

    meters = {}
    for i, batch in enumerate(loader):
        if args.max_batches > 0 and i >= args.max_batches:
            break
        slots = np.asarray(batch["slots"])
        past = slots[:, :history_len]
        rng = jax.random.PRNGKey(i)
        frames = np.asarray(jax.device_get(
            rollout_decode(past, rng)))  # [B, rollout_len, H, W, 3]
        gt = np.asarray(
            batch["img"])[:, history_len:history_len + rollout_len]
        x = np.clip(frames * 0.5 + 0.5, 0, 1).reshape(-1, *frames.shape[2:])
        y = np.clip(gt * 0.5 + 0.5, 0, 1).reshape(-1, *gt.shape[2:])
        res = {
            "mse": M.mse_metric(x, y),
            "psnr": M.psnr_metric(x, y),
            "ssim": M.ssim_metric(x, y),
        }
        n = x.shape[0]
        for k, v in res.items():
            meters.setdefault(k, AverageMeter()).update(v, n)
        print(f"[{i}/{len(loader)}] " + " ".join(
            f"{k}={m.avg:.4f}" for k, m in meters.items()))
    print("FINAL " + " ".join(f"{k}={m.avg:.4f}"
                              for k, m in meters.items()))


if __name__ == "__main__":
    main()
