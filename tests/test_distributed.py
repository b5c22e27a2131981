"""Multi-host smoke test: 2 real processes wired by jax.distributed.

The reference's DDP contract is multi-PROCESS (one per GPU,
torch.distributed NCCL group — scripts/sbatch_run.sh:37-42). The JAX
analog is `jax.distributed.initialize()`; this test launches two
separate Python processes on the CPU backend, connects them through
`maybe_initialize_distributed()`'s explicit-coordinator env path, and
checks a cross-process global-array reduction — i.e. the exact wiring
`scripts/train.py` uses on a pod slice.
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")  # undo axon sitecustomize

import numpy as np

from slotdiffusion_tpu.parallel import (make_mesh,
                                        maybe_initialize_distributed,
                                        shard_batch)

assert maybe_initialize_distributed(verbose=False), "detection failed"
assert jax.process_count() == 2, jax.process_count()
mesh = make_mesh()
assert len(jax.devices()) == 2

# each process contributes one row; the global array is assembled across
# processes exactly like a sharded train batch
local = np.full((1, 4), jax.process_index() + 1.0, np.float32)
batch = shard_batch({"x": local}, mesh)
total = jax.jit(lambda x: x.sum())(batch["x"])
print("DIST_OK", float(jax.device_get(total)))
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_distributed():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        # the workers must not inherit the test runner's virtual-device
        # XLA flags (each should expose exactly 1 CPU device)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        # rows are (1,1,1,1) and (2,2,2,2) -> global sum 12
        assert "DIST_OK 12.0" in out, f"proc {pid} output:\n{out}"
