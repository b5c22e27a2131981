"""parallel/aot.py sizing helpers (fast tier — no train-step compiles).

The full compile-for-topology matrix runs via scripts/aot_scaling.py
(docs/scaling.md); here we pin the math it rests on: abstract-topology
mesh construction and exact per-chip byte accounting from
NamedSharding.shard_shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from slotdiffusion_tpu.parallel import aot


@pytest.mark.fast
def test_topology_devices_and_mesh():
    devs = aot.topology_devices("v5e:2x4")
    assert len(devs) == 8
    assert all(d.device_kind == "TPU v5 lite" for d in devs)

    mesh = aot.make_topology_mesh("v5e:2x4", model_axis=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    with pytest.raises(AssertionError):
        aot.make_topology_mesh("v5e:2x4", model_axis=3)  # 8 % 3 != 0


@pytest.mark.fast
def test_per_chip_bytes_replicated_vs_sharded():
    mesh = aot.make_topology_mesh("v5e:2x4", model_axis=2)  # data 4 x model 2
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    model_sh = NamedSharding(mesh, P(None, "model"))

    x = jax.ShapeDtypeStruct((16, 8), jnp.float32)  # 512 B total
    # replicated: every chip holds the full array
    assert aot.per_chip_bytes({"x": x}, rep) == 16 * 8 * 4
    # data-sharded over 4: a chip holds 4 rows
    assert aot.per_chip_bytes({"x": x}, {"x": data_sh}) == 4 * 8 * 4
    # model-sharded over 2 on the last dim
    assert aot.per_chip_bytes({"x": x}, {"x": model_sh}) == 16 * 4 * 4

    # mixed tree with a replicated-shorthand sharding (single NamedSharding
    # broadcast over the tree)
    tree = {"a": jax.ShapeDtypeStruct((3,), jnp.bfloat16),
            "b": {"c": jax.ShapeDtypeStruct((5, 5), jnp.int32)}}
    assert aot.per_chip_bytes(tree, rep) == 3 * 2 + 25 * 4


@pytest.mark.fast
def test_plan_names():
    m1 = aot.make_topology_mesh("v5e:2x4", model_axis=1)
    m2 = aot.make_topology_mesh("v5e:2x4", model_axis=2)
    assert aot._plan_name(m1, fsdp=False) == "dp8"
    assert aot._plan_name(m2, fsdp=False) == "dp4xtp2"
    assert aot._plan_name(m1, fsdp=True) == "dp8+fsdp"
