"""Unified training CLI.

The analog of reference scripts/train.py:16-118: pick a Python config file
(`--params`), build dataset/model/method, fit with resume support. The
reference's `--ddp` flag is subsumed by the mesh: data parallelism is on
whenever >1 device is visible; `--fp16` maps to bf16 compute via
`params.use_bf16`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


from slotdiffusion_tpu.utils import apply_overrides  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="slotdiffusion-tpu trainer")
    parser.add_argument("--params", required=True,
                        help="path to a Python config file")
    parser.add_argument("--weight", default="", help="resume checkpoint")
    parser.add_argument("--ckp_path", default="",
                        help="checkpoint dir (default: ./checkpoint/<cfg>)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute (the fp16/AMP analog)")
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend (debug)")
    parser.add_argument("--tp", type=int, default=1,
                        help="model-axis size of the (data, model) mesh: "
                             "tensor-parallel attention/FFN shardings "
                             "(parallel/tp.py) on top of data parallelism")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3-style sharding of large param/"
                             "optimizer/EMA leaves over the data axis "
                             "(parallel/tp.py:fsdp_augment); composes "
                             "with --tp")
    parser.add_argument("--san_check_val_step", type=int, default=2)
    parser.add_argument("--max_steps", type=int, default=-1,
                        help="cap total optimizer steps (smoke tests)")
    parser.add_argument("--max_epochs", type=int, default=-1,
                        help="override params.max_epochs (smoke tests / "
                             "synthetic-pipeline refreshes)")
    parser.add_argument("--profile_dir", default="",
                        help="write a jax.profiler trace of a few train "
                             "steps to this dir")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VALUE",
                        help="override any params attribute post-load "
                             "(the CLI analog of the reference scripts' "
                             "params mutation, e.g. test_recon.py:203-208); "
                             "values parse as Python literals, falling "
                             "back to strings")
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        # the axon sitecustomize sets jax_platforms via jax.config at
        # interpreter startup, which takes precedence over the env var
        jax.config.update("jax_platforms", "cpu")

    # multi-host wiring (pod slice / Slurm / explicit coordinator env) —
    # must happen before any backend-initializing JAX call below
    from slotdiffusion_tpu.parallel import maybe_initialize_distributed
    maybe_initialize_distributed()

    from slotdiffusion_tpu.data import DataModule, build_dataset
    from slotdiffusion_tpu.methods import build_method
    from slotdiffusion_tpu.models import build_model
    from slotdiffusion_tpu.utils import load_params

    params = load_params(args.params)
    if args.bf16:
        params.use_bf16 = True
    if args.max_steps > 0:
        params.max_steps = args.max_steps
    if args.max_epochs > 0:
        params.max_epochs = args.max_epochs
    if args.profile_dir:
        params.profile_dir = args.profile_dir
    apply_overrides(params, args.overrides)

    built = build_dataset(params)
    collate_fn = None
    if len(built) == 3:  # COCO also returns its padding collater
        train_set, val_set, collate_fn = built
    else:
        train_set, val_set = built
    datamodule = DataModule(
        params, train_set, val_set, collate_fn=collate_fn,
        process_index=jax.process_index(),
        process_count=jax.process_count())

    model = build_model(params)

    ckp_path = args.ckp_path or os.path.join(
        "checkpoint",
        os.path.splitext(os.path.basename(args.params))[0])
    mesh = None
    if args.tp > 1:
        from slotdiffusion_tpu.parallel import make_mesh
        mesh = make_mesh(model=args.tp)
    if args.fsdp:
        params.fsdp = True
    method = build_method(
        model=model, datamodule=datamodule, params=params,
        ckp_path=ckp_path, mesh=mesh)

    print(f"devices: {jax.devices()}")
    print(f"training {params.model} for {params.max_epochs} epochs "
          f"({method.total_steps} steps), ckpt -> {ckp_path}")
    method.fit(resume_from=args.weight or None,
               san_check_val_step=args.san_check_val_step)


if __name__ == "__main__":
    main()
