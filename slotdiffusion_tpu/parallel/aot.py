"""AOT compile-for-topology sizing of the train step.

Compiles the FULL Trainer train step (loss-weighted grads, optax update,
EMA) for TPU pod topologies that are not physically attached, via
`jax.experimental.topologies` + `jit(...).lower(...).compile()`, and
accounts per-chip memory under each parallelism plan (DP / DP x TP /
DP + FSDP). This turns the multi-chip story from "functionally correct on
an 8-device virtual mesh" into "sized for real pod slices": per-chip
parameter / optimizer / EMA / batch bytes come from the actual
`NamedSharding.shard_shape` of every leaf, and scratch (activation)
bytes from XLA's own `compiled.memory_analysis()`.

The reference has no analog — its scaling evidence is `torch.distributed`
DDP launched on however many GPUs are present
(/root/reference/scripts/train.py:87-110, docs/benchmark.md:33-38); you
learn whether a configuration fits by running it. Here GSPMD lets us
compile the exact program a v5e-32 would run, on a CPU host, and read the
memory budget off the executable.

Driven by scripts/aot_scaling.py; results table in docs/scaling.md.
"""

from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HBM_BYTES = {
    # per-chip HBM capacity of the TPU generations we size for
    "TPU v5 lite": 16 * 1024**3,
    "TPU v4": 32 * 1024**3,
}


def topology_devices(topo_name: str):
    """Abstract (unattached) TPU devices for e.g. 'v5e:4x4', 'v4:2x2x4'."""
    import os

    # libtpu single-instances itself via /tmp/libtpu_lockfile; detached
    # topology compiles own no hardware, so concurrent loads (tests + a
    # running sizing matrix) are safe and must not abort on the lock
    os.environ.setdefault("ALLOW_MULTIPLE_LIBTPU_LOAD", "true")
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(topo_name, "tpu")
    return list(topo.devices)


def make_topology_mesh(topo_name: str, model_axis: int = 1) -> Mesh:
    devices = topology_devices(topo_name)
    n = len(devices)
    assert n % model_axis == 0, (topo_name, n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def _broadcast_sh(tree, sharding_tree):
    """Expand a single NamedSharding (replicated shorthand) to the tree."""
    if isinstance(sharding_tree, NamedSharding):
        return jax.tree_util.tree_map(lambda _: sharding_tree, tree)
    return sharding_tree


def _as_sds(tree, sharding_tree):
    def one(leaf, sh):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)

    return jax.tree_util.tree_map(one, tree, _broadcast_sh(
        tree, sharding_tree))


def per_chip_bytes(tree, sharding_tree) -> int:
    """Bytes one chip holds for `tree` laid out by `sharding_tree`."""
    total = 0
    leaves = zip(jax.tree_util.tree_leaves(tree),
                 jax.tree_util.tree_leaves(
                     _broadcast_sh(tree, sharding_tree),
                     is_leaf=lambda x: isinstance(x, NamedSharding)))
    for leaf, sh in leaves:
        shard = sh.shard_shape(tuple(leaf.shape))
        total += int(np.prod(shard, dtype=np.int64)) * \
            np.dtype(leaf.dtype).itemsize
    return int(total)


def build_method_for_topology(cfg, mesh: Mesh, per_replica_batch: int = 8):
    """Instantiate model + Trainer against an abstract-topology mesh.

    The config's dataset is swapped for the in-memory synthetic stand-in
    at the SAME resolution / frame count (only batch SHAPES matter for
    AOT sizing), and stage-1 checkpoint paths are cleared (nothing is
    executed, so grafting real weights would be wasted IO and usually
    impossible on a sizing host)."""
    from ..data import DataModule, build_dataset
    from ..methods import build_method
    from ..models import build_model

    data_size = mesh.shape["data"]
    cfg.train_batch_size = per_replica_batch * data_size
    cfg.val_batch_size = cfg.train_batch_size
    # synthetic stand-in with identical sample shapes
    n_frames = cfg.get("n_sample_frames", None)
    cfg.dataset = "synthetic_video" if n_frames else "synthetic"
    cfg.train_samples = cfg.train_batch_size
    cfg.val_samples = cfg.train_batch_size
    cfg.num_workers = 0
    cfg.load_mask = False
    # clear stage-1 grafts — shapes come from model.init alone
    dec = cfg.get("dec_dict") or {}
    if (dec.get("vae_dict") or {}).get("vqvae_ckp_path"):
        dec["vae_dict"]["vqvae_ckp_path"] = ""
    if dec.get("dm_ckp_path"):
        dec["dm_ckp_path"] = ""
    if (cfg.get("dvae_dict") or {}).get("dvae_ckp_path"):
        cfg["dvae_dict"]["dvae_ckp_path"] = ""

    train_set, val_set = build_dataset(cfg)
    dm = DataModule(cfg, train_set, val_set)
    model = build_model(cfg)
    return build_method(model=model, datamodule=dm, params=cfg,
                        ckp_path=None, mesh=mesh)


def compile_train_step(cfg, topo_name: str, model_axis: int = 1,
                       fsdp: bool = False, per_replica_batch: int = 8
                       ) -> Dict:
    """AOT-compile the full train step for `topo_name` and account memory.

    Returns a report dict with per-chip bytes for params / optimizer /
    EMA / batch (from shard shapes) and XLA temp + code bytes (from
    memory_analysis), plus the HBM headroom verdict.
    """
    mesh = make_topology_mesh(topo_name, model_axis)
    cfg.fsdp = bool(fsdp)
    method = build_method_for_topology(cfg, mesh, per_replica_batch)

    batch = next(iter(method.datamodule.train_loader))
    data_sh = NamedSharding(mesh, P("data"))
    batch_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=data_sh),
        dict(batch))

    state = jax.eval_shape(method._init_state_pure, batch_sds)
    state_sh = _broadcast_sh(state, method._state_shardings(state))
    state_sds = _as_sds(state, state_sh)
    method.state = state_sds
    method._build_steps()

    lowered = method._train_step.lower(state_sds, batch_sds)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()

    n_chips = len(mesh.devices.flatten())
    kind = mesh.devices.flatten()[0].device_kind
    hbm = HBM_BYTES.get(kind, 16 * 1024**3)
    rep = {
        "topology": topo_name,
        "n_chips": n_chips,
        "device_kind": kind,
        "plan": _plan_name(mesh, fsdp),
        "per_replica_batch": per_replica_batch,
        "global_batch": int(cfg.train_batch_size),
        "params_per_chip": per_chip_bytes(state.params, state_sh.params),
        "opt_per_chip": per_chip_bytes(state.opt_state, state_sh.opt_state),
        "ema_per_chip": (per_chip_bytes(state.ema, state_sh.ema)
                         if state.ema is not None else 0),
        "batch_per_chip": per_chip_bytes(
            batch_sds, jax.tree_util.tree_map(lambda _: data_sh, batch_sds)),
        "temp_per_chip": int(ma.temp_size_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
        "argument_per_chip": int(ma.argument_size_in_bytes),
        "output_per_chip": int(ma.output_size_in_bytes),
        "hbm_per_chip": hbm,
    }
    state_bytes = (rep["params_per_chip"] + rep["opt_per_chip"] +
                   rep["ema_per_chip"])
    rep["state_per_chip"] = state_bytes
    # donated input state aliases the output state, so peak ~= one copy of
    # the state + the incoming batch + XLA scratch
    rep["peak_per_chip"] = state_bytes + rep["batch_per_chip"] + \
        rep["temp_per_chip"]
    rep["fits"] = bool(rep["peak_per_chip"] < hbm)
    return rep


def _plan_name(mesh: Mesh, fsdp: bool) -> str:
    d, m = mesh.shape["data"], mesh.shape.get("model", 1)
    name = f"dp{d}"
    if m > 1:
        name += f"xtp{m}"
    if fsdp:
        name += "+fsdp"
    return name


def format_table(rows: List[Dict]) -> str:
    """GitHub-markdown table for docs/scaling.md."""
    def mb(x):
        return f"{x / 1024**2:,.1f}"

    hdr = ("| topology | chips | plan | global bs | params/chip MB | "
           "opt/chip MB | ema/chip MB | batch/chip MB | XLA temp/chip MB | "
           "peak/chip MB | HBM | fits |")
    sep = "|" + "---|" * 12
    lines = [hdr, sep]
    for r in rows:
        lines.append(
            f"| {r['topology']} | {r['n_chips']} | {r['plan']} | "
            f"{r['global_batch']} | {mb(r['params_per_chip'])} | "
            f"{mb(r['opt_per_chip'])} | {mb(r['ema_per_chip'])} | "
            f"{mb(r['batch_per_chip'])} | {mb(r['temp_per_chip'])} | "
            f"{mb(r['peak_per_chip'])} | "
            f"{r['hbm_per_chip'] // 1024**3} GB | "
            f"{'yes' if r['fits'] else 'NO'} |")
    return "\n".join(lines)
