"""Device mesh + sharding utilities.

TPU-native replacement for the reference's distributed stack (PyTorch DDP
over NCCL via `torch.distributed.launch`, docs/benchmark.md:35,
scripts/sbatch_run.sh:37-42). Instead of one process per accelerator with
explicit gradient all-reduce, we build a `jax.sharding.Mesh` with a `data`
axis, shard every batch over it, replicate parameters, and let XLA insert
the gradient all-reduce inside the jitted train step — collectives ride ICI.

The mesh also carries a `model` axis (size 1 by default). Models at this
scale (1e7-1e8 params, SURVEY.md §2.3) replicate fine; the `model` axis is
plumbed so large variants can shard attention heads / mlp without trainer
changes.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Create an (data, model) mesh over the given/all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def get_mesh() -> Mesh:
    """Return the process-global mesh, creating a default one on first use."""
    global _MESH
    if _MESH is None:
        _MESH = make_mesh()
    return _MESH


def set_mesh(mesh: Mesh):
    global _MESH
    _MESH = mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batches."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Double-buffering: yield device-sharded batches while a background
    thread stages the next `size` batches (host collate + async H2D).

    The torch reference gets this overlap from DataLoader's
    pin_memory/worker machinery; here a single thread calling
    `shard_batch` ahead of the consumer keeps the host input pipeline and
    the device step concurrent — `jax.device_put` is asynchronous, so by
    the time the consumer's jitted step needs batch i+1 its transfer has
    already been issued."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(size, 1))
    _END = object()

    def stage():
        try:
            for batch in iterator:
                q.put(shard_batch(batch, mesh))
        except BaseException as e:  # surface loader errors to the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=stage, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch dict with the leading dim sharded over `data`.

    With multi-host JAX each process holds only its slice; here
    `jax.make_array_from_process_local_data` assembles the global array.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
