"""Multi-host initialization.

The reference scales out with `python -m torch.distributed.launch
--nproc_per_node=N scripts/train.py --ddp` (reference
scripts/sbatch_run.sh:37-42, scripts/train.py:89,108): one process per
GPU, NCCL process group, DistributedSampler. The JAX pod-slice analog is
one process per *host*, wired together by `jax.distributed.initialize()`
before any backend touch; after that `jax.devices()` is global,
`jax.process_count()` drives the per-host loader shard
(data/loader.py), and the jitted step's mesh spans all chips.

`maybe_initialize_distributed()` decides whether this process is part of
a multi-host launch. It must be called before any other JAX API that
initializes a backend (`scripts/train.py` calls it first thing).
"""

import os

__all__ = ["maybe_initialize_distributed"]


def _env_int(name, default=1):
    try:
        return int(os.environ.get(name, "") or default)
    except ValueError:
        return default


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Call `jax.distributed.initialize()` when a multi-host launch is
    detected; return True iff it was called.

    Detection, in priority order:

    1. ``SLOTDIFFUSION_MULTIHOST=1`` — explicit opt-in; relies on JAX's
       own auto-detection (Cloud TPU metadata / Slurm env).
    2. Explicit coordinator env vars: ``JAX_COORDINATOR_ADDRESS`` (or
       ``COORDINATOR_ADDRESS``) + ``JAX_NUM_PROCESSES`` > 1 +
       ``JAX_PROCESS_ID`` — the manual wiring used by
       `scripts/tpu_run.sh` and the 2-process CPU smoke test.
    3. Cloud TPU pod slice: ``TPU_WORKER_HOSTNAMES`` lists >1 host
       (the TPU runtime publishes this on every pod-slice worker).
    4. Slurm: ``SLURM_NTASKS`` > 1.

    Single-host runs (including this repo's 1-chip dev tunnel) match
    none of these and skip initialization entirely — `jax.distributed`
    is NOT needed for single-process multi-chip.
    """
    import jax

    called_with = None
    if os.environ.get("SLOTDIFFUSION_MULTIHOST", "") not in ("", "0"):
        called_with = {}
    else:
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS")
        nproc = _env_int("JAX_NUM_PROCESSES", 0) or \
            _env_int("NUM_PROCESSES", 0)
        if coord and nproc > 1:
            pid = _env_int("JAX_PROCESS_ID",
                           _env_int("PROCESS_ID", 0))
            called_with = dict(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
        elif len([h for h in os.environ.get(
                "TPU_WORKER_HOSTNAMES", "").split(",") if h]) > 1:
            called_with = {}
        elif _env_int("SLURM_NTASKS", 1) > 1:
            called_with = {}

    if called_with is None:
        return False
    jax.distributed.initialize(**called_with)
    if verbose:
        print(f"[distributed] initialized: process "
              f"{jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    return True
