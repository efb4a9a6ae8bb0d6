"""Multi-host seam (parallel/dp.py): 2 simulated processes on CPU.

The reference reaches multi-node through torchrun env:// + NCCL
(dist_utils.py:12-43); ours is jax.distributed.initialize + a pod-wide mesh.
This test spawns 2 real OS processes that form a JAX cluster over a local
coordinator, build a global 4-device mesh (2 CPU devices per process), run a
psum'd shard_map step, all-gather ragged eval-style objects, and broadcast
an early-stop scalar."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
sys.path.insert(0, {repo!r})

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dfine_tpu.parallel.dp import (
    broadcast_scalar,
    gather_objects,
    init_multihost,
    is_main_process,
    make_mesh,
)

pid = int(sys.argv[1])
init_multihost("localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh()  # global 4-device mesh

def body(x):
    return jax.lax.psum(x.sum(), "dp")

f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("dp"),), out_specs=P()))
from jax.experimental import multihost_utils
xg = multihost_utils.host_local_array_to_global_array(
    np.arange(4, dtype=np.float32) + 4 * pid, mesh, P("dp")
)
total = float(jax.device_get(f(xg)))
assert total == sum(range(8)), total

# trainer-path helpers: every process builds the SAME global batch, keeps
# its row slice (DistributedSampler analog); state replicates pod-wide
from dfine_tpu.parallel.dp import replicate, shard_batch
batch = {"images": np.arange(8, dtype=np.float32).reshape(8, 1)}
bg = shard_batch(batch, mesh)
assert bg["images"].shape == (8, 1)
total2 = float(jax.device_get(
    jax.jit(shard_map(lambda b: jax.lax.psum(b["images"].sum(), "dp"),
                      mesh=mesh, in_specs=(P("dp"),), out_specs=P()))(bg)
))
assert total2 == sum(range(8)), total2
state = replicate({"w": np.full((3,), 7.0, np.float32)}, mesh)
assert float(jax.device_get(state["w"].sum())) == 21.0

# ragged object gather (eval predictions analog)
local_objs = [{"rank": pid, "i": i, "payload": "x" * (10 + 37 * pid)} for i in range(2 + pid)]
merged = gather_objects(local_objs)
assert len(merged) == 5, merged
assert [o["rank"] for o in merged] == [0, 0, 1, 1, 1]

# early-stop broadcast: every process must see rank 0's value
v = broadcast_scalar(123.0 if pid == 0 else -1.0, src=0)
assert v == 123.0, v

print(f"WORKER{pid}_OK main={is_main_process()}")
"""


@pytest.mark.slow
def test_two_process_cluster():
    port = _free_port()
    code = WORKER.replace("{repo!r}", repr(str(REPO))).replace("{port}", str(port))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu"},
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{err[-3000:]}"
        assert f"WORKER{i}_OK" in out
    assert "main=True" in outs[0][1]
    assert "main=False" in outs[1][1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
