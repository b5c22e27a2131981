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


def train_state_shardings(state, mesh: Mesh):
    """NamedSharding tree congruent with a TrainState (or any pytree).

    Optimizer moments (optax mu/nu/acc_grads) and the EMA shadow mirror
    the param dict structure, so the same tail-anchored rules shard them
    identically — required for the donated buffers to stay in place
    across steps. Everything unmatched replicates.
    """
    tp = mesh.shape.get("model", 1)

    def one(path, leaf):
        if tp == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(path, leaf, tp))

    return jax.tree_util.tree_map_with_path(one, state)


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
