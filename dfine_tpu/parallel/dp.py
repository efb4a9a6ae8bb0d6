"""Data parallelism over a TPU device mesh — the DDP replacement.

The reference scales with torchrun + DDP + NCCL all-reduce hooks
(src/d_fine/dist_utils.py:12-43, src/dl/train.py:161-169).  The TPU-native
design is single-controller SPMD: one 1-axis ``jax.sharding.Mesh`` over ICI,
the train step wrapped in ``shard_map`` with ``axis_name='dp'`` so gradients,
BN statistics (SyncBN, reference train.py:159-160) and loss normalizers
(reference dfine_criterion.py:440-453) ride ``psum``/``pmean`` collectives
that XLA schedules on the interconnect.  There is no process group, no
rendezvous, no rank logic: replicated state + sharded batch in, replicated
state + scalar metrics out.

D-FINE is a <=62M-param vision model, so pure DP is the right parallelism
(SURVEY.md 2c); the mesh helper still accepts extra axes for future
tensor-parallel experiments.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()
            ),
            tree,
        )
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def unreplicate(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Shard leading (batch) dim of every leaf across the mesh axis.

    Multi-host: ``batch`` is the GLOBAL batch (every process builds the same
    one from the same seed — the DistributedSampler analog); each process
    keeps its contiguous row slice and the slices are joined into one global
    array across the pod."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        pid, pc = jax.process_index(), jax.process_count()

        def conv(x):
            x = np.asarray(x)
            per = x.shape[0] // pc
            local = x[pid * per : (pid + 1) * per]
            return multihost_utils.host_local_array_to_global_array(local, mesh, P(axis))

        return jax.tree.map(conv, batch)
    s = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def make_dp_train_step(step_fn, mesh: Mesh, axis: str = "dp"):
    """Wrap a per-shard step (built with axis_name=axis) in shard_map + jit.

    step_fn: (state, batch, rng) -> (state, metrics) where state is
    replicated, batch is batch-sharded, rng is per-replica (folded in).
    """
    from jax.experimental.shard_map import shard_map

    def wrapped(state, batch, rng):
        def body(state, batch, rng):
            r = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            new_state, metrics = step_fn(state, batch, r)
            return new_state, metrics

        sharded = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return sharded(state, batch, rng)

    return jax.jit(wrapped, donate_argnums=(0,))


def gather_predictions(preds: Sequence[Dict[str, np.ndarray]]) -> list:
    """Host-side gather of eval predictions.

    Under single-controller JAX the fully-addressable eval outputs already
    live on the host; the reference's ``all_gather_object`` ship-to-rank-0
    (dist_utils.py:121-187) reduces to a list concat.  On multi-host pods
    use ``gather_objects`` below.
    """
    out = []
    for p in preds:
        out.extend(p if isinstance(p, list) else [p])
    return out


# ------------------------------------------------------------- multi-host --
#
# The reference reaches multiple nodes through torchrun's env:// rendezvous +
# NCCL (dist_utils.py:12-43).  The JAX equivalent is one controller process
# per host joined via jax.distributed.initialize; the SPMD mesh then spans
# every host's chips and the SAME shard_map train step runs unchanged — only
# host-side python (eval gather, early-stop flag) needs explicit cross-
# process communication, provided by the helpers below.


def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-process JAX cluster (reference init_distributed_mode,
    dist_utils.py:12-43).  After this, jax.devices() spans all hosts and
    make_mesh() builds a pod-wide DP mesh."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


_BARRIER_SEQ = {"n": 0}


def barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Pod-wide rendezvous through the jax.distributed COORDINATION SERVICE
    (not a gloo/ICI collective, so it tolerates minutes of arrival skew).

    XLA:CPU's gloo transport has a hard ~30 s context-init handshake: if one
    process reaches the pod's first collective >30 s before its peers (e.g.
    1-core compile skew, or an asymmetric persistent-cache hit), the early
    process dies with "Gloo context initialization failed: DEADLINE_EXCEEDED"
    (found by tests/test_multihost_trainer.py, r5).  Calling ``barrier``
    immediately before a phase's first collective equalizes arrival to
    milliseconds.  All processes must call in the same order (SPMD host
    code); names are sequence-suffixed so repeated phases stay unique.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # not launched through jax.distributed (tests)
        return
    _BARRIER_SEQ["n"] += 1
    client.wait_at_barrier(f"dfine_{name}_{_BARRIER_SEQ['n']}", timeout_ms)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def broadcast_scalar(value: float, src: int = 0) -> float:
    """Every process returns src's value (reference dist_utils.py:104-118,
    the early-stop flag broadcast)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return float(
        multihost_utils.broadcast_one_to_all(
            np.asarray(value, np.float32), is_source=jax.process_index() == src
        )
    )


def gather_objects(local: list) -> list:
    """All-gather a list of arbitrary picklable objects across processes —
    the reference's ``all_gather_object`` (dist_utils.py:121-187) for eval
    predictions.  Objects are pickled to padded uint8 arrays and shipped
    through ``process_allgather``; every process returns the concatenated
    list ordered by process index."""
    if jax.process_count() == 1:
        return list(local)
    import pickle

    from jax.experimental import multihost_utils

    # arrival skew before this phase's first gloo collective (eval wall time
    # differs per process) must stay under gloo's 30 s handshake budget
    barrier("gather_objects")

    payload = np.frombuffer(pickle.dumps(list(local)), np.uint8)
    n = np.asarray([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(n)  # [P, 1]
    max_n = int(sizes.max())
    padded = np.zeros(max_n, np.uint8)
    padded[: payload.size] = payload
    blobs = multihost_utils.process_allgather(padded)  # [P, max_n]
    out = []
    for i in range(jax.process_count()):
        out.extend(pickle.loads(blobs[i, : int(sizes[i, 0])].tobytes()))
    return out
