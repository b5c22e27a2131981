"""Reconstruction-quality evaluation harness.

Analog of reference video_based/test_recon.py / img_based/test_recon.py:
encode to slots, decode with the model's generative decoder (DPM-Solver for
diffusion models with `same_noise=True` for temporal consistency,
test_recon.py:24-44), compute MSE/PSNR/SSIM (+LPIPS when VGG weights are
available), dump frames for external FID/FVD, with per-batch resumable
metric caching (test_recon.py:74-88).

With `--fid` / `--fvd` (and converted InceptionV3 / I3D weight npz files,
see ops/fid.py and ops/fvd.py) the recon-vs-GT FID/FVD are additionally
computed natively on-device; per-batch features join the resumable cache
so interrupted runs keep their Frechet statistics too.
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
    parser.add_argument("--split", default="val", choices=["val", "test"])
    parser.add_argument("--use_dpm", action="store_true", default=True)
    parser.add_argument("--save_video", action="store_true",
                        help="dump decoded frames for FID/FVD")
    parser.add_argument("--out_dir", default="")
    parser.add_argument("--fid", action="store_true",
                        help="native FID vs GT frames (needs "
                             "SLOTDIFFUSION_INCEPTION_WEIGHTS)")
    parser.add_argument("--fvd", action="store_true",
                        help="native FVD vs GT clips (video models, "
                             "needs SLOTDIFFUSION_I3D_WEIGHTS)")
    args = parser.parse_args()

    import jax
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.models.diffusion import LDM
    from slotdiffusion_tpu.ops import metrics as M
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import (AverageMeter, dump_obj, load_obj,
                                         load_params, mkdir_or_exist)
    from slotdiffusion_tpu.utils.misc import save_image

    params = load_params(args.params)
    val_set = build_dataset(params, val_only=(args.split == "test"))
    if isinstance(val_set, tuple):
        val_set = val_set[1]

    bs = args.bs if args.bs > 0 else params.val_batch_size
    loader = DataLoader(val_set, batch_size=bs, shuffle=False,
                        drop_last=False,
                        num_workers=params.get("num_workers", 4))

    model = build_model(params)
    variables = load_model_params(model, args.weight, params)
    is_video = params.model in ("SAVi", "SAViDiffusion", "STEVE")

    @jax.jit
    def recon_fn(batch, rng):
        if params.model in ("SADiffusion", "SAViDiffusion"):
            out = model.apply(
                variables, batch, rng, True, params.get("same_noise", True),
                rngs={"diffusion": rng}, method=model.log_images)
            return out["samples"]
        if params.model in ("SA", "SAVi"):
            out = model.apply(variables, batch,
                              rngs={"diffusion": rng})
            return out["recon_img"]
        if params.model in ("SLATE", "STEVE"):
            out = model.apply(variables, batch, testing=True,
                              rngs={"diffusion": rng})
            return model.apply(variables, out["slots"], rng,
                               method=model.recon_img)
        raise ValueError(params.model)

    fid_fn = fvd_fn = None
    if args.fid:
        from slotdiffusion_tpu.ops import fid as fid_mod
        if fid_mod.inception_available():
            fid_fn = jax.jit(fid_mod.inception_pool3_features)
        else:
            print(f"WARNING: --fid needs {fid_mod.WEIGHTS_ENV}; skipping")
    if args.fvd:
        from slotdiffusion_tpu.ops import fvd as fvd_mod
        if fvd_mod.i3d_available():
            fvd_fn = jax.jit(fvd_mod.i3d_features)
        else:
            print(f"WARNING: --fvd needs {fvd_mod.WEIGHTS_ENV}; skipping")

    # resumable per-batch metric cache (test_recon.py:74-88)
    cache_path = os.path.join(
        args.out_dir or "eval_cache",
        os.path.basename(args.params) + ".metrics.pkl")
    cache = load_obj(cache_path) if os.path.isfile(cache_path) else {}

    meters = {}
    for i, np_batch in enumerate(loader):
        if i in cache:
            results = cache[i]
        else:
            rng = jax.random.PRNGKey(i)
            samples = np.asarray(jax.device_get(
                recon_fn({"img": np_batch["img"]}, rng)))
            gt = np_batch["img"]
            # to [0, 1]
            x = np.clip(samples * 0.5 + 0.5, 0, 1)
            y = np.clip(gt * 0.5 + 0.5, 0, 1)
            fvd_feats = None
            if fvd_fn is not None and is_video and x.ndim == 5:
                if x.shape[1] < 9:
                    print(f"WARNING: T={x.shape[1]} < 9; I3D needs >= 9, "
                          f"skipping FVD")
                else:
                    fvd_feats = (np.asarray(jax.device_get(fvd_fn(x))),
                                 np.asarray(jax.device_get(fvd_fn(y))))
            if is_video:  # fold T into batch for image metrics
                x = x.reshape(-1, *x.shape[2:])
                y = y.reshape(-1, *y.shape[2:])
            results = {
                "mse": M.mse_metric(x, y),
                "psnr": M.psnr_metric(x, y),
                "ssim": M.ssim_metric(x, y),
            }
            from slotdiffusion_tpu.ops.lpips import (lpips_available,
                                                     lpips_distance,
                                                     weights_label)
            if lpips_available():
                import jax.numpy as jnp
                # key carries weight provenance: 'lpips[src=<sha8>]' for
                # converted real weights, 'lpips(untrained-weights)' for
                # random/replica npz — never a bare headline
                results[weights_label("lpips")] = float(np.mean(np.asarray(
                    lpips_distance(jnp.asarray(x * 2 - 1),
                                   jnp.asarray(y * 2 - 1)))))
            # cache raw features (not stats) so resumed runs rebuild
            # exact Frechet statistics; "_"-prefixed keys skip the meters
            if fid_fn is not None:
                results["_fid"] = (
                    np.asarray(jax.device_get(fid_fn(x))),
                    np.asarray(jax.device_get(fid_fn(y))))
            if fvd_feats is not None:
                results["_fvd"] = fvd_feats
            if args.save_video:
                out_dir = mkdir_or_exist(os.path.join(
                    args.out_dir or "eval_frames",
                    os.path.basename(args.params)))
                for b in range(x.shape[0]):
                    save_image(x[b], os.path.join(
                        out_dir, f"b{i:04d}_{b:03d}.png"))
            cache[i] = results
            dump_obj(cache, cache_path)
        n = np_batch["img"].shape[0]
        for k, v in results.items():
            if not k.startswith("_"):
                meters.setdefault(k, AverageMeter()).update(v, n)
        print(f"[{i}/{len(loader)}] " + " ".join(
            f"{k}={m.avg:.4f}" for k, m in meters.items()))
    final = {k: m.avg for k, m in meters.items()}
    for key, name in (("_fid", "fid"), ("_fvd", "fvd")):
        pairs = [r[key] for r in cache.values() if key in r]
        if pairs:
            from slotdiffusion_tpu.ops.fid import FeatureStats, \
                frechet_distance
            dim = pairs[0][0].shape[1]
            gen, real = FeatureStats(dim), FeatureStats(dim)
            for g, r in pairs:
                gen.update(g)
                real.update(r)
            if name == "fid":
                from slotdiffusion_tpu.ops.fid import weights_label
            else:
                from slotdiffusion_tpu.ops.fvd import weights_label
            final[weights_label(name)] = frechet_distance(
                *gen.finalize(), *real.finalize())
    print("FINAL " + " ".join(f"{k}={v:.4f}" for k, v in final.items()))


if __name__ == "__main__":
    main()
