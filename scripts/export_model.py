"""Export a trained model's serving surface to a StableHLO artifact.

    python scripts/export_model.py --params <cfg.py> --weight <ckpt> \
        --what encode|sample|denoise --bs 8 --out exports/encode.shlo \
        [--platforms tpu cpu] [--check]

The artifact reloads anywhere with ONLY jax installed:

    from slotdiffusion_tpu.serving import load_artifact   # or inline the
    call, header = load_artifact("exports/encode.shlo")   # 15-line loader
    slots, masks = call(imgs)

`--platforms tpu cpu` cross-lowers so a CPU box can export for TPU
serving. `--check` reloads the artifact and runs it on zeros, printing
output shapes (on the current backend; skipped if the artifact was
exported only for other platforms).
"""

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def load_params(path):
    spec = importlib.util.spec_from_file_location("cfg", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SlotAttentionParams()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--params", required=True)
    parser.add_argument("--weight", default=None,
                        help="checkpoint; omit for random-init (smoke)")
    parser.add_argument("--what", default="encode",
                        choices=("encode", "sample", "denoise"))
    parser.add_argument("--bs", type=int, default=8)
    parser.add_argument("--out", required=True)
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="e.g. --platforms tpu cpu (cross-lowering)")
    parser.add_argument("--check", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from slotdiffusion_tpu import serving
    from slotdiffusion_tpu.models import build_model

    params = load_params(args.params)
    model = build_model(params)
    res = tuple(params.resolution)
    shape = (args.bs, *res, 3)
    is_video = bool(
        (params.get("n_sample_frames")
         and "video" in str(params.get("dataset", "")))
        or params.model.startswith(("SAVi", "STEVE")))
    if is_video:
        shape = (args.bs, params.get("n_sample_frames", 3), *res, 3)

    if args.weight:
        from slotdiffusion_tpu.training.checkpoint import load_model_params
        variables = load_model_params(model, args.weight, params)
    else:
        import jax.numpy as jnp

        # init through the loss path: flax only creates params for
        # executed submodules, and the DM decoder runs there, not in the
        # plain encode forward
        rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(
            ("params", "diffusion", "gumbel", "dropout", "default"))}
        variables = model.init(
            rngs, {"img": jnp.zeros(shape, jnp.float32)},
            method=model.compute_losses)
        variables = {"params": variables["params"]}
        print("WARNING: no --weight, exporting random-init params")

    fn, example_args = serving.build_serving_fn(
        model, variables, args.what, shape)
    header = serving.save_artifact(
        args.out, fn, example_args,
        meta={"params": os.path.basename(args.params), "what": args.what,
              "weight": args.weight or "random-init"},
        platforms=args.platforms)
    size = os.path.getsize(args.out)
    print(f"exported {args.what} -> {args.out} ({size/1e6:.1f} MB), "
          f"args {header['args']}, platforms {header['platforms']}")

    if args.check:
        import numpy as np

        call, header = serving.load_artifact(args.out)
        backend = jax.default_backend()
        plats = header["platforms"]
        if plats and backend not in plats:
            print(f"check skipped: artifact for {plats}, host is {backend}")
            return
        outs = call(*[np.zeros(a["shape"], a["dtype"])
                      for a in header["args"]])
        shapes = jax.tree_util.tree_map(lambda x: x.shape, outs)
        print(f"check OK on {backend}: output shapes {shapes}")


if __name__ == "__main__":
    main()
