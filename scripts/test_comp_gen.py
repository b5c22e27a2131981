"""Compositional generation harness.

Analog of reference test_comp_gen.py: encode slots, then cyclically shift
each slot index across the batch (slot k comes from sample (b + k) % B,
test_comp_gen.py:25-31) to compose novel scenes, decode with the diffusion
decoder, and dump frames for external FID/FVD.

With `--fid` (and `SLOTDIFFUSION_INCEPTION_WEIGHTS` pointing at a
converted InceptionV3 npz, see ops/fid.py) the FID between composed and
real frames is additionally computed natively on-device — a capability
the reference defers to the external `pytorch-fid` tool
(docs/img_based.md:82-84).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def shuffle_slots(slots):
    """slots: [B, (T,) N, C] -> cyclic per-slot shuffle across batch."""
    import numpy as np
    B = slots.shape[0]
    N = slots.shape[-2]
    out = np.empty_like(slots)
    for k in range(N):
        out[..., k, :] = np.roll(slots[..., k, :], shift=k, axis=0)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", required=True)
    parser.add_argument("--bs", type=int, default=-1)
    parser.add_argument("--out_dir", default="comp_gen_frames")
    parser.add_argument("--max_batches", type=int, default=-1)
    parser.add_argument("--fid", action="store_true",
                        help="also compute FID natively (needs "
                             "SLOTDIFFUSION_INCEPTION_WEIGHTS)")
    parser.add_argument("--fvd", action="store_true",
                        help="also compute FVD natively on video clips "
                             "(needs SLOTDIFFUSION_I3D_WEIGHTS)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slotdiffusion_tpu.data import DataLoader, build_dataset
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.models.diffusion import LDM
    from slotdiffusion_tpu.training.checkpoint import load_model_params
    from slotdiffusion_tpu.utils import load_params, mkdir_or_exist
    from slotdiffusion_tpu.utils.misc import save_image

    params = load_params(args.params)
    val_set = build_dataset(params, val_only=True)
    bs = args.bs if args.bs > 0 else params.val_batch_size
    loader = DataLoader(val_set, batch_size=bs, shuffle=False,
                        drop_last=True,
                        num_workers=params.get("num_workers", 4))
    model = build_model(params)
    variables = load_model_params(model, args.weight, params)

    @jax.jit
    def encode_fn(batch, rng):
        out = model.apply(variables, batch, train=False,
                          rngs={"diffusion": rng})
        return out["slots"]

    def decode(slots, rng):
        """Model-specific slots -> frames (reference test_comp_gen.py:25-53
        dispatches the same way: DM decode, AR generate, or broadcast)."""
        flat = slots.reshape(-1, slots.shape[-2], slots.shape[-1])

        if params.model in ("SADiffusion", "SAViDiffusion"):
            def _dec(mdl, s, r):
                x = mdl.dm_decoder.generate_imgs(
                    r, cond=s, use_dpm=True,
                    same_noise=params.get("same_noise", True))
                if isinstance(mdl.dm_decoder, LDM):
                    x = mdl.dm_decoder.decode_latent(x)
                return x

            return model.apply(variables, jnp.asarray(flat), rng,
                               method=_dec)
        if params.model in ("SLATE", "STEVE"):
            return model.apply(variables, jnp.asarray(flat), rng,
                               method=lambda m, s, r: m.recon_img(s, rng=r))
        # SA / SAVi: spatial-broadcast decoder, recon is first output
        return model.apply(variables, jnp.asarray(flat),
                           method=lambda m, s: m.decode(s)[0])

    fid_stats = None
    if args.fid:
        from slotdiffusion_tpu.ops import fid as fid_mod
        if not fid_mod.inception_available():
            print(f"WARNING: --fid requested but {fid_mod.WEIGHTS_ENV} "
                  f"is unset/missing; skipping native FID")
        else:
            feat_fn = jax.jit(fid_mod.inception_pool3_features)
            fid_stats = (fid_mod.FeatureStats(), fid_mod.FeatureStats())

    fvd_stats = None
    if args.fvd:
        from slotdiffusion_tpu.ops import fvd as fvd_mod
        if not fvd_mod.i3d_available():
            print(f"WARNING: --fvd requested but {fvd_mod.WEIGHTS_ENV} "
                  f"is unset/missing; skipping native FVD")
        else:
            i3d_fn = jax.jit(fvd_mod.i3d_features)
            fvd_stats = (fvd_mod.FeatureStats(400),
                         fvd_mod.FeatureStats(400))

    def _accumulate_fid(stats, frames01):
        frames = frames01.reshape(-1, *frames01.shape[-3:])
        stats.update(np.asarray(jax.device_get(
            feat_fn(jnp.asarray(frames)))))

    def _accumulate_fvd(stats, clips01):
        stats.update(np.asarray(jax.device_get(
            i3d_fn(jnp.asarray(clips01)))))

    out_dir = mkdir_or_exist(args.out_dir)
    count = 0
    for i, np_batch in enumerate(loader):
        if args.max_batches > 0 and i >= args.max_batches:
            break
        rng = jax.random.PRNGKey(i)
        slots = np.asarray(jax.device_get(
            encode_fn({"img": np_batch["img"]}, rng)))
        slots = shuffle_slots(slots)
        samples = np.asarray(jax.device_get(decode(slots, rng)))
        x = np.clip(samples * 0.5 + 0.5, 0, 1)
        real = np.clip(np.asarray(np_batch["img"]) * 0.5 + 0.5, 0, 1)
        if fid_stats is not None:
            _accumulate_fid(fid_stats[0], x)
            _accumulate_fid(fid_stats[1], real)
        if fvd_stats is not None and real.ndim == 5:
            if real.shape[1] < 9:
                if i == 0:
                    print(f"WARNING: clips have T={real.shape[1]} < 9 "
                          f"frames; I3D needs >= 9, skipping native FVD")
            else:
                # x is B*T flat frames for video models; fold to clips
                _accumulate_fvd(fvd_stats[0], x.reshape(real.shape))
                _accumulate_fvd(fvd_stats[1], real)
        for b in range(x.shape[0]):
            save_image(x[b], os.path.join(out_dir, f"{count:06d}.png"))
            count += 1
        print(f"[{i}/{len(loader)}] wrote {count} frames")
    if fid_stats is not None:
        from slotdiffusion_tpu.ops.fid import frechet_distance
        fid = frechet_distance(*fid_stats[0].finalize(),
                               *fid_stats[1].finalize())
        from slotdiffusion_tpu.ops.fid import weights_label
        print(f"native {weights_label('FID')} (composed vs real, "
              f"{fid_stats[0].n} vs {fid_stats[1].n} frames): {fid:.3f}")
    if fvd_stats is not None and fvd_stats[0].n:
        from slotdiffusion_tpu.ops.fid import frechet_distance
        fvd = frechet_distance(*fvd_stats[0].finalize(),
                               *fvd_stats[1].finalize())
        from slotdiffusion_tpu.ops.fvd import weights_label
        print(f"native {weights_label('FVD')} (composed vs real, "
              f"{fvd_stats[0].n} vs {fvd_stats[1].n} clips): {fvd:.3f}")
    print(f"DONE: {count} composed frames in {out_dir} "
          f"(run external FID/FVD on them)")


if __name__ == "__main__":
    main()
