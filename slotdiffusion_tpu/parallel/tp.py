"""Tensor-parallel parameter shardings over the mesh's `model` axis.

TPU-native scaling beyond data parallelism: instead of the reference's
single-axis DDP (docs/benchmark.md:35 — one process per GPU, NCCL
all-reduce), we annotate parameter leaves with `PartitionSpec`s over a
2-D `(data, model)` mesh and let XLA's GSPMD partitioner insert the
collectives (all-gather for column-parallel inputs, reduce-scatter /
psum for row-parallel outputs) — they ride ICI inside the one jitted
train step. Math is unchanged: GSPMD resharding is semantics-preserving,
so TP runs produce the same losses as replicated runs up to reduction
order.

The rules follow the Megatron pattern on the transformer blocks (where
the FLOPs concentrate once models grow past a single chip's HBM):

- attention q/k/v projections: column-parallel (output/head dim sharded)
- attention output projection: row-parallel (input dim sharded; the
  partial products are psum'd by GSPMD, bias stays replicated)
- FFN first matmul (GEGLU fused proj / ffn_fc1): column-parallel
- FFN second matmul (TransformerBlock out Dense / ffn_fc2): row-parallel

Convolutions, norms, and embeddings stay replicated: at SlotDiffusion
scale (1e7-1e8 params, SURVEY.md §2.3) their weights are small and
GroupNorm needs full channel rows; sharding them would trade one HBM
copy for per-layer all-gathers.

A rule only fires when the sharded dimension divides the `model`-axis
size; otherwise the leaf is replicated (never an error) so one rule
table serves every model family and tp degree.
"""

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (tail regex on the /-joined param path, spec, index of the sharded dim)
_RULES = (
    # LDM UNet SpatialTransformer (models/unet.py: CrossAttention, GEGLU,
    # TransformerBlock FFN out-proj is the only Dense_0 under block{i})
    (re.compile(r"attn\d+/to_[qkv]/kernel$"), P(None, "model"), 1),
    (re.compile(r"attn\d+/to_out/kernel$"), P("model", None), 0),
    (re.compile(r"GEGLU_\d+/Dense_\d+/kernel$"), P(None, "model"), 1),
    (re.compile(r"GEGLU_\d+/Dense_\d+/bias$"), P("model"), 0),
    (re.compile(r"block\d+/Dense_\d+/kernel$"), P("model", None), 0),
    # STEVE/SLATE AR token decoder (models/ar_decoder.py)
    (re.compile(r"proj_[qkv]/kernel$"), P(None, "model"), 1),
    (re.compile(r"proj_o/kernel$"), P("model", None), 0),
    (re.compile(r"ffn_fc1/kernel$"), P(None, "model"), 1),
    (re.compile(r"ffn_fc1/bias$"), P("model"), 0),
    (re.compile(r"ffn_fc2/kernel$"), P("model", None), 0),
)


def _path_str(path) -> str:
    return "/".join(re.findall(r"\w+", jax.tree_util.keystr(path)))


def param_spec(path, leaf, tp_size: int) -> P:
    """PartitionSpec for one leaf. `path` is a jax key path (or a
    /-joined string); GEGLU's fused projection additionally requires each
    split half to divide tp_size (jnp.split at out_dim keeps both halves
    shardable)."""
    s = path if isinstance(path, str) else _path_str(path)
    if getattr(leaf, "ndim", 0) == 0:
        return P()
    for rx, spec, dim in _RULES:
        if rx.search(s):
            if leaf.ndim <= dim:
                return P()
            size = leaf.shape[dim]
            if "GEGLU" in s:
                size //= 2
            if size % tp_size != 0:
                return P()
            return spec
    return P()


# FSDP sharding threshold: leaves below this many elements replicate —
# gathering tiny tensors costs more latency than their memory saves
_FSDP_MIN_SIZE = 1 << 14


def fsdp_augment(spec: P, leaf, data_size: int) -> P:
    """ZeRO-3-style augmentation: additionally shard one dimension of a
    large leaf over the `data` axis (params, optimizer moments, and the
    EMA shadow all pass through here, so the full ZeRO trio is sharded).

    The TPU-native mechanism is pure GSPMD: parameters live sharded in
    HBM; XLA inserts the per-layer all-gather before use and the
    reduce-scatter of gradients back to the shards — no hand-written
    collectives, and the math is unchanged (resharding is
    semantics-preserving, asserted by tests/test_fsdp.py).

    Picks the largest dimension not already sharded whose size divides
    the data-axis extent; leaves with no such dimension (or fewer than
    _FSDP_MIN_SIZE elements) keep their base spec.
    """
    ndim = getattr(leaf, "ndim", 0)
    if data_size <= 1 or ndim == 0 or leaf.size < _FSDP_MIN_SIZE:
        return spec
    names = list(spec) + [None] * (ndim - len(spec))
    best = None
    for d in range(ndim):
        if names[d] is None and leaf.shape[d] % data_size == 0:
            if best is None or leaf.shape[d] > leaf.shape[best]:
                best = d
    if best is None:
        return spec
    names[best] = "data"
    return P(*names)


def train_state_shardings(state, mesh: Mesh, fsdp: bool = False):
    """NamedSharding tree congruent with a TrainState (or any pytree).

    Optimizer moments (optax mu/nu/acc_grads) and the EMA shadow mirror
    the param dict structure, so the same tail-anchored rules shard them
    identically — required for the donated buffers to stay in place
    across steps. Everything unmatched replicates. With `fsdp`, large
    leaves additionally shard over the `data` axis (fsdp_augment).
    """
    tp = mesh.shape.get("model", 1)
    data = mesh.shape.get("data", 1)

    def one(path, leaf):
        spec = param_spec(path, leaf, tp) if tp > 1 else P()
        if fsdp:
            spec = fsdp_augment(spec, leaf, data)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def fsdp_param_count(params, mesh: Mesh) -> int:
    """Number of param elements actually sharded over `data` under FSDP
    (for logging / asserting the layout engaged)."""
    tp = mesh.shape.get("model", 1)
    data = mesh.shape.get("data", 1)
    n = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        base = param_spec(path, leaf, tp) if tp > 1 else P()
        if "data" in fsdp_augment(base, leaf, data):
            n += leaf.size
    return n


def tp_param_count(params, mesh: Mesh) -> int:
    """Number of param elements that actually shard over `model` (for
    logging / asserting TP engaged)."""
    tp = mesh.shape.get("model", 1)
    if tp == 1:
        return 0
    n = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if param_spec(path, leaf, tp) != P():
            n += leaf.size
    return n
